#!/usr/bin/env python
"""Capture a jax.profiler trace of the codec round-trip.

Usage: python tools/profile_codec.py [--out DIR] [--size HxW] [--ckpt DIR]

Writes a TensorBoard-compatible trace (SURVEY.md §5: the reference has
only wall-clock timers; this is the deeper TPU-native equivalent).
View with: tensorboard --logdir DIR  (or xprof).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/llicti_trace")
    ap.add_argument("--size", default="512x768")
    ap.add_argument("--ckpt", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_ckpt"))
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/llicti_jax_cache")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from llicti_tpu.codec import Codec
    from llicti_tpu.config import ModelConfig
    from llicti_tpu.data.dataset import synthetic_image
    from llicti_tpu.models.llicti import LLICTIModel

    h, w = (int(v) for v in args.size.split("x"))
    cfg = ModelConfig()
    model = LLICTIModel(cfg=cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3), jnp.float32))
    try:
        from llicti_tpu.utils.checkpoint import CheckpointManager

        params, _ = CheckpointManager(args.ckpt).load("bench", params)
    except FileNotFoundError:
        pass
    codec = Codec(cfg, params,
                  use_pallas_cdf=jax.default_backend() == "tpu")
    img = synthetic_image(h, w, seed=42)
    streams = codec.compress(img)  # warm/compile
    out = codec.decompress(streams)
    assert np.array_equal(out[0], img)

    jax.profiler.start_trace(args.out)
    with jax.profiler.TraceAnnotation("compress"):
        streams = codec.compress(img)
    with jax.profiler.TraceAnnotation("decompress"):
        out = codec.decompress(streams)
    jax.profiler.stop_trace()
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
