#!/usr/bin/env python
"""Device-sustained decode sweep over rANS lane counts and batch K.

The decode program's rANS scan step count is n_syms/num_lanes, so more
lanes trade stream size (+N*4 B lane flush, +renorm slack) for scan
time.  bench.py fixed 1024 after r4's 512-vs-1024 measurement; this
sweeps further and prints one JSON line per variant so the winner can
be promoted with evidence.  Run in the round-end TPU window (chip must
be free).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/llicti_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    import numpy as np

    from llicti_tpu.codec import Codec
    from llicti_tpu.config import ModelConfig
    from llicti_tpu.data.dataset import load_rgb, synthetic_image
    from llicti_tpu.models.llicti import LLICTIModel
    from llicti_tpu.utils.checkpoint import CheckpointManager

    H, W = 512, 768
    cfg = ModelConfig()
    model = LLICTIModel(cfg=cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))
    try:
        params, meta = CheckpointManager(
            os.path.join(REPO, "bench_ckpt")).load("bench", params)
    except FileNotFoundError:
        meta = {}
    on_tpu = jax.default_backend() == "tpu"

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
    mp = H * W / 1e6

    def sustained(fn, M=20):
        _ = jax.device_get(fn()[0, :1, 0, 0])  # warm
        h = fn()
        t0 = time.time()
        _ = jax.device_get(h[0, :1, 0, 0])
        rtt = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(M):
                h = fn()
            _ = jax.device_get(h[0, :1, 0, 0])
            best = min(best, (time.time() - t0 - rtt) / M)
        return best

    for lanes in (1024, 2048, 4096):
        codec = Codec(cfg, params, use_pallas_cdf=on_tpu, num_lanes=lanes)
        streams = codec.compress(img)
        out = codec.decompress(streams)
        ok = bool(np.array_equal(out[0], img))
        t = sustained(codec.prepare_decode(streams))
        print(json.dumps({
            "variant": f"lanes{lanes}",
            "ms_per_img": round(t * 1000, 2),
            "mps": round(mp / t, 2),
            "bpsp": round(Codec.num_bytes(streams) * 8 / img.size, 4),
            "lossless": ok,
        }), flush=True)

    # batch-K sweep at the bench's lane count
    codec = Codec(cfg, params, use_pallas_cdf=on_tpu, num_lanes=1024)
    for K in (4, 8):
        bstreams = codec.compress_batch([img] * K)
        bfn = codec.prepare_decode_batch(bstreams)
        t = sustained(bfn, M=8) / K
        outs = codec.decompress_batch(bstreams)
        ok = all(np.array_equal(o, img) for o in outs)
        print(json.dumps({
            "variant": f"batchK{K}_lanes1024",
            "ms_per_img": round(t * 1000, 2),
            "mps": round(mp / t, 2),
            "lossless": bool(ok),
        }), flush=True)


if __name__ == "__main__":
    main()
