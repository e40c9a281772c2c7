#!/usr/bin/env python
"""Offline experiment-results analysis (reference experiments/results_parser.py).

Scans experiment directories for ``results.json`` files and either prints
a table or plots rate (vs dist when present, else vs experiment index).

Usage: python tools/results_parser.py experiments/<name> [--plot out.png]
"""
from __future__ import annotations

import argparse
import json
import os


def collect(root: str):
    rows = []
    for dirpath, _, files in sorted(os.walk(root)):
        if "results.json" in files:
            with open(os.path.join(dirpath, "results.json")) as f:
                data = json.load(f)
            rows.append((dirpath, data))
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--plot", default=None, help="write a scatter plot PNG")
    args = ap.parse_args()
    rows = collect(args.root)
    if not rows:
        print(f"no results.json under {args.root}")
        return
    print(f"{'experiment':50s} {'rate':>8s} {'dist':>8s}")
    pts = []
    for path, data in rows:
        rate = data.get("rate", data.get("bpsp"))
        dist = data.get("dist", 0.0)
        print(f"{path:50s} {rate:8.4f} {dist:8.4f}")
        pts.append((rate, dist))
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        plt.scatter(xs, ys)
        plt.xlabel("rate (bpsp)")
        plt.ylabel("dist")
        plt.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
