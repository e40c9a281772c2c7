#!/usr/bin/env python
"""Per-scale rate breakdown: ours vs the reference's logged breakdown.

Parses the final test-epoch rate table of an eval_protocol log
(``docs/eval_r*/eval_log.txt``) and emits a markdown comparison against
the reference's published per-scale numbers, logged after ~1.8M
training iterations on the OpenImages-L3C 500-image set
(/root/reference experiments .../exp_debug.log, 2022-12-01 test epoch:
``hd=0.024 s0=0.045 s1=0.160 s2=0.554 s3=1.844 s4=5.475`` -> 8.10
total).  Scale convention matches on both sides: s0 = coarsest,
s4 = finest (most bits).

The comparison is directional, not apples-to-apples: our corpus is the
self-built 123-image photographic set and training is far shorter; the
per-scale SHAPE (how rate concentrates in the fine scales) is the
transferable signal.

Usage: python tools/scale_breakdown.py docs/eval_r5/eval_log.txt \
           [docs/eval_r5/BREAKDOWN.md]
"""
from __future__ import annotations

import re
import sys

REFERENCE = {  # bits/subpixel*3 (bpp over RGB), reference exp_debug.log
    "hd": 0.024, "s0": 0.045, "s1": 0.160, "s2": 0.554,
    "s3": 1.844, "s4": 5.475,
}
REF_STEPS = "~1.8M iters, OpenImages-L3C 500 train imgs (llicti_A.json)"


def parse_last_test_epoch(text: str):
    """Return {hd: x, s0: x, ...} in bpp from the LAST test-epoch block."""
    vals = {}
    # rate tables print (hd=1.561) / (s0=5.511) groups; keep the last
    # occurrence of each key
    for key, val in re.findall(r"\((hd|s\d+)=([0-9.]+)\)", text):
        vals[key] = float(val)
    return vals


def main() -> None:
    log_path = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    with open(log_path) as f:
        vals = parse_last_test_epoch(f.read())
    if not vals:
        sys.exit(f"no test-epoch rate table found in {log_path}")

    keys = ["hd"] + sorted(
        (k for k in vals if k.startswith("s")), key=lambda k: int(k[1:]))
    ours_total = sum(vals[k] for k in keys)
    ref_total = sum(REFERENCE.values())
    lines = [
        "# Per-scale rate breakdown vs the reference",
        "",
        f"Ours: eval_protocol test-epoch table from `{log_path}`.",
        f"Reference: {REF_STEPS}; logged test-epoch breakdown "
        "(exp_debug.log 2022-12-01).",
        "",
        "Caveat (stated once): corpora and training scale differ — ours "
        "is a self-built 123-image photographic corpus at a fraction of "
        "the reference's iterations, so absolute levels are not "
        "comparable; the per-scale *distribution* is the meaningful "
        "comparison (both sides: s0 = coarsest).",
        "",
        "| scale | ours (bpp) | ours (% of total) | reference (bpp) | "
        "reference (% of total) |",
        "|---|---|---|---|---|",
    ]
    for k in keys:
        ref = REFERENCE.get(k)
        lines.append(
            f"| {k} | {vals[k]:.3f} | {vals[k] / ours_total * 100:.1f}% | "
            + (f"{ref:.3f} | {ref / ref_total * 100:.1f}% |" if ref is
               not None else "- | - |"))
    lines.append(f"| **total** | **{ours_total:.3f}** | 100% | "
                 f"**{ref_total:.3f}** | 100% |")
    lines.append("")
    lines.append(f"Totals: ours {ours_total / 3:.4f} bpsp vs reference "
                 f"{ref_total / 3:.4f} bpsp on their respective test sets.")
    md = "\n".join(lines) + "\n"
    if out_path:
        with open(out_path, "w") as f:
            f.write(md)
    print(md)


if __name__ == "__main__":
    main()
