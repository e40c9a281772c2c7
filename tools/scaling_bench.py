#!/usr/bin/env python
"""Multi-process DP scaling-efficiency harness.

Measures optimizer steps/s at 1..N processes (each a jax.distributed
participant) and reports parallel efficiency vs the 1-process baseline —
the harness for the ">=80% scaling at >=2 hosts" north star
(BASELINE.md).  On this box it exercises the CPU backend with fake
devices per process; on a real pod, point each host at the coordinator
(--coordinator host0:port --rank i --nprocs N) and the same worker
measures over real ICI/DCN.

Usage (single box, all process groups spawned locally):
    python tools/scaling_bench.py --max-procs 2 --steps 20
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(os.path.dirname(HERE), "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_group(nprocs: int, steps: int, devices_per_proc: int) -> dict:
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    env["JAX_PLATFORMS"] = "cpu"
    with tempfile.TemporaryDirectory() as outdir:
        procs = [
            subprocess.Popen(
                [sys.executable, WORKER, str(rank), str(nprocs), coord,
                 outdir, str(steps)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for rank in range(nprocs)
        ]
        outs = [p.communicate()[0].decode() for p in procs]
        for p, out in zip(procs, outs):
            if p.returncode != 0:
                raise RuntimeError(f"worker failed:\n{out}")
        with open(os.path.join(outdir, "rank0.json")) as f:
            return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-procs", type=int, default=2)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--devices-per-proc", type=int, default=2)
    args = ap.parse_args()

    results = {}
    for n in range(1, args.max_procs + 1):
        r = run_group(n, args.steps, args.devices_per_proc)
        results[n] = r
        base = results[1]["steps_per_s"]
        # perfect DP scaling = constant steps/s at n x the global batch
        eff = r["steps_per_s"] / base if base else float("nan")
        print(f"{n} proc(s) x {args.devices_per_proc} dev: "
              f"{r['steps_per_s']:.2f} steps/s "
              f"(global batch {2 * r['global_devices']}, "
              f"efficiency {eff * 100:.0f}%)", flush=True)
    print(json.dumps({
        "metric": "dp_scaling_efficiency",
        "value": round(results[args.max_procs]["steps_per_s"]
                       / results[1]["steps_per_s"], 3),
        "unit": "x(weak-scaling, steps/s ratio)",
        "procs": args.max_procs,
    }))


if __name__ == "__main__":
    main()
