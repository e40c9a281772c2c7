#!/usr/bin/env python
"""Spaced single-image e2e decode-latency probe (fused vs two-stage).

The dev harness tunnel has multi-minute bandwidth/RTT phases; a single
bench window samples one phase.  This probe takes one fused and one
two-stage latency sample per spaced attempt (default 12 attempts,
45 s apart ≈ 9 min across phases) and writes the per-attempt series +
best to a JSON file, so a low-RTT phase is recorded when it occurs
(VERDICT r4 task #4 asks for <100 ms "in at least one spaced attempt").

Usage: python tools/latency_probe.py [out.json] [n_attempts] [gap_s]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/latency_probe.json"
    n_attempts = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    gap_s = float(sys.argv[3]) if len(sys.argv) > 3 else 45.0

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/llicti_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import numpy as np

    from llicti_tpu.codec import Codec
    from llicti_tpu.config import ModelConfig
    from llicti_tpu.data.dataset import load_rgb, synthetic_image
    from llicti_tpu.models.llicti import LLICTIModel
    from llicti_tpu.utils.checkpoint import CheckpointManager

    H, W = 512, 768
    cfg = ModelConfig()
    model = LLICTIModel(cfg=cfg)
    import jax.numpy as jnp

    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3), jnp.float32))
    try:
        params, meta = CheckpointManager(
            os.path.join(REPO, "bench_ckpt")).load("bench", params)
    except FileNotFoundError:
        meta = {}
    img = None
    test_dir = os.path.join(REPO, "data_corpus", "test")
    if os.path.isdir(test_dir):
        for f in sorted(os.listdir(test_dir)):
            full = load_rgb(os.path.join(test_dir, f))
            if full.shape[0] >= H and full.shape[1] >= W:
                img = np.ascontiguousarray(full[:H, :W])
                break
    if img is None:
        img = synthetic_image(H, W, seed=42)

    on_tpu = jax.default_backend() == "tpu"
    lanes = 1024 if on_tpu else 512
    codec = Codec(cfg, params, use_pallas_cdf=on_tpu, num_lanes=lanes)
    codec_ts = Codec(cfg, params, use_pallas_cdf=on_tpu, num_lanes=lanes,
                     two_stage=True)
    streams = codec.compress(img)
    streams_ts = codec_ts.compress(img)
    assert np.array_equal(codec.decompress(streams)[0], img)
    assert np.array_equal(codec_ts.decompress(streams_ts)[0], img)

    attempts = []
    for i in range(n_attempts):
        t0 = time.time()
        codec.decompress(streams)
        fused_ms = (time.time() - t0) * 1000
        t0 = time.time()
        codec_ts.decompress(streams_ts)
        ts_ms = (time.time() - t0) * 1000
        attempts.append({"t": round(time.time(), 1),
                         "fused_ms": round(fused_ms, 1),
                         "two_stage_ms": round(ts_ms, 1)})
        print(f"attempt {i}: fused {fused_ms:.1f} ms, "
              f"two-stage {ts_ms:.1f} ms", file=sys.stderr, flush=True)
        result = {
            "image": f"{H}x{W}", "checkpoint": meta,
            "n_attempts": len(attempts), "gap_s": gap_s,
            "best_fused_ms": min(a["fused_ms"] for a in attempts),
            "best_two_stage_ms": min(a["two_stage_ms"] for a in attempts),
            "best_ms": min(min(a["fused_ms"], a["two_stage_ms"])
                           for a in attempts),
            "attempts": attempts,
        }
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        if i < n_attempts - 1:
            time.sleep(gap_s)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "attempts"}))


if __name__ == "__main__":
    main()
