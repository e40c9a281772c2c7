"""File-level codec CLI: encode a PNG/JPEG to a .llic bitstream and back.

Usage:
  python -m llicti_tpu.cli encode IMAGE OUT.llic [--ckpt DIR] [--config J]
  python -m llicti_tpu.cli decode IN.llic OUT.png [--ckpt DIR] [--config J]

The bitstream is the serialized stream-group list (Codec.serialize).  The
model params come from an Orbax checkpoint dir (``--ckpt``, file name
"bench"/"model_best"/...; default: random init — still lossless, just a
poor rate).  A practical front-end the reference lacks (its eval_model
mode only round-trips in memory, agents/llicti_agent.py:122-164).
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def _load_codec(args):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/llicti_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from .codec import Codec
    from .config import ModelConfig, config_from_json
    from .models.llicti import LLICTIModel

    cfg = (config_from_json(args.config).model if args.config
           else ModelConfig())
    model = LLICTIModel(cfg=cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    if args.ckpt:
        from .utils.checkpoint import CheckpointManager

        params, _meta = CheckpointManager(args.ckpt).load(args.ckpt_name,
                                                          params)
    return Codec(cfg, params, num_lanes=args.lanes)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llicti_tpu.cli")
    ap.add_argument("cmd", choices=["encode", "decode"])
    ap.add_argument("inp")
    ap.add_argument("out")
    ap.add_argument("--ckpt", default=None, help="Orbax checkpoint dir")
    ap.add_argument("--ckpt-name", default="bench")
    ap.add_argument("--config", default=None, help="JSON config path")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--lanes", type=int, default=512)
    args = ap.parse_args(argv)

    import numpy as np

    from .codec import Codec

    codec = _load_codec(args)
    if args.cmd == "encode":
        from .data.dataset import load_rgb

        img = load_rgb(args.inp)
        t0 = time.time()
        streams = codec.compress(img)
        blob = Codec.serialize(streams)
        with open(args.out, "wb") as f:
            f.write(blob)
        bpsp = len(blob) * 8 / img.size
        print(f"{args.inp}: {img.shape[0]}x{img.shape[1]} -> "
              f"{len(blob)} bytes ({bpsp:.3f} bpsp) "
              f"in {time.time()-t0:.2f}s", file=sys.stderr)
    else:
        with open(args.inp, "rb") as f:
            blob = f.read()
        t0 = time.time()
        out = codec.decompress(Codec.deserialize(blob))
        try:
            from PIL import Image

            Image.fromarray(out[0]).save(args.out)
            written = args.out
        except ImportError:
            written = args.out + ".npy"
            np.save(written, out[0])
        print(f"{args.inp}: -> {out.shape[1]}x{out.shape[2]} "
              f"written to {written} in {time.time()-t0:.2f}s",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
