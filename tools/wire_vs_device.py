#!/usr/bin/env python
"""Decompose codec latency into device compute vs host<->device wire.

The 10x north-star question (VERDICT r1 weak#1): how much of the
per-image decode time is TPU compute and how much is the tunnel?  This
script measures each leg directly, no trace parsing:

1. raw wire bandwidth: device_put / device_get of sized buffers,
2. device-only decode: the full per-scale program chain re-run with
   already-device-resident stream words (no upload, no image fetch),
   timed with block_until_ready,
3. end-to-end decode latency and pipelined throughput (bench.py's
   figures) for the same image.

Output: one JSON object on stdout; prose on stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/llicti_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    import numpy as np

    from llicti_tpu.codec import Codec
    from llicti_tpu.coder import rans_device as rd
    from llicti_tpu.config import ModelConfig
    from llicti_tpu.data.dataset import synthetic_image
    from llicti_tpu.models.llicti import LLICTIModel
    from llicti_tpu.ops.wavelet import unpack_pad_flags

    H, W = 512, 768
    cfg = ModelConfig()
    model = LLICTIModel(cfg=cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3), jnp.float32))
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_ckpt")
    try:
        from llicti_tpu.utils.checkpoint import CheckpointManager

        params, meta = CheckpointManager(ckpt).load("bench", params)
        print(f"params: {meta}", file=sys.stderr)
    except FileNotFoundError:
        pass
    on_tpu = jax.default_backend() == "tpu"
    codec = Codec(cfg, params, use_pallas_cdf=on_tpu)

    test_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data_corpus", "test")
    img = None
    if os.path.isdir(test_dir):
        from llicti_tpu.data.dataset import load_rgb

        for f in sorted(os.listdir(test_dir)):
            full = load_rgb(os.path.join(test_dir, f))
            if full.shape[0] >= H and full.shape[1] >= W:
                img = np.ascontiguousarray(full[:H, :W])
                break
    if img is None:
        img = synthetic_image(H, W, seed=42)

    # ---- 1. raw wire bandwidth --------------------------------------------
    def bw(nbytes, reps=5):
        buf = np.zeros(nbytes, np.uint8)
        d = jax.device_put(buf)
        jax.block_until_ready(d)
        t0 = time.time()
        for _ in range(reps):
            d = jax.device_put(buf)
            jax.block_until_ready(d)
        up = (time.time() - t0) / reps
        t0 = time.time()
        for _ in range(reps):
            _ = np.asarray(jax.device_get(d))
        down = (time.time() - t0) / reps
        return nbytes / up / 1e6, nbytes / down / 1e6

    up1, down1 = bw(1 << 20)
    up8, down8 = bw(8 << 20)
    print(f"wire: 1MB up {up1:.1f} MB/s down {down1:.1f} MB/s | "
          f"8MB up {up8:.1f} MB/s down {down8:.1f} MB/s", file=sys.stderr)

    # ---- warm everything ---------------------------------------------------
    streams = codec.compress(img)
    out = codec.decompress(streams)
    assert np.array_equal(out[0], img)
    nbytes = Codec.num_bytes(streams)

    # ---- 2. device-only decode --------------------------------------------
    # Stage the stream words/states/raw band on device ONCE, then re-run
    # the exact per-scale program chain the decoder uses and sync on the
    # device-resident uint8 image (no stream upload, no image download).
    hdr = streams[0][0]
    S = int(np.frombuffer(hdr[:1], np.uint8)[0])
    last_h, last_w = (int(v) for v in np.frombuffer(hdr[1:5], np.uint16))
    minmax = [int(v) for v in np.frombuffer(streams[0][1], np.int16)]
    pad_int = int(np.frombuffer(streams[0][2], np.int16)[0])
    pad_flags = unpack_pad_flags(pad_int, S)
    raw = np.frombuffer(streams[0][3], np.uint8).reshape(1, last_h, last_w, 3)
    ranges = codec._ranges(minmax)
    states_np, words_np = rd.unpack_stream(streams[1][0], codec.N)
    up = -(-max(1, words_np.size) // 16384) * 16384
    w_small = jnp.asarray(
        np.pad(words_np.astype(np.uint16), (0, up - words_np.size))[None])
    cap = codec._words_cap(S, raw.shape[1], raw.shape[2], pad_flags)
    words_dev = jax.block_until_ready(codec._pad_words(w_small, cap))
    states0 = jnp.asarray(states_np[None], jnp.uint32)
    raw_dev = jnp.asarray(raw)
    one = jnp.int32(1)

    shapes = dict((scl, (h, w)) for scl, h, w in codec._scale_shapes(
        S, raw.shape[1], raw.shape[2], pad_flags))
    c4 = 4 * cfg.cond_channels

    y_direct = tuple(codec._const("zeros_f32", (1,) + shapes[scl] + (c4,))
                     for scl in range(S))
    pf_t = codec._pad_flags_t(pad_flags)

    def device_decode():
        _y, rgb, _b, _c, _s, _i = codec._image_fn(
            codec.params, raw_dev, y_direct, words_dev, states0, one,
            codec._pts3(ranges), pf_t, ranges, codec.N)
        return rgb

    jax.block_until_ready(device_decode())  # warm
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out_dev = device_decode()
    jax.block_until_ready(out_dev)
    dev_t = (time.time() - t0) / reps

    # ---- 3. end-to-end ----------------------------------------------------
    t0 = time.time()
    for _ in range(3):
        out = codec.decompress(streams)
    e2e_t = (time.time() - t0) / 3
    n_pipe = 6
    pipe_t = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = codec.decompress_many([streams] * n_pipe)
        pipe_t = min(pipe_t, (time.time() - t0) / n_pipe)

    # ---- 4. two-stage (partial-stream) decode overlap ---------------------
    # head = coarse scales on the stream PREFIX (dispatched first), tail
    # upload rides behind it: measures how much of the upload the split
    # hides vs the fused single-program path, interleaved + spaced so
    # both families sample the same tunnel phases.
    codec2 = Codec(cfg, params, use_pallas_cdf=on_tpu, two_stage=True)
    streams2 = codec2.compress(img)
    out2 = codec2.decompress(streams2)
    assert np.array_equal(out2[0], img)
    head_words = int(np.frombuffer(streams2[0][0][13:17], np.uint32)[0])
    total_words = (len(streams2[1][0]) - codec2.N * 4) // 2
    ts_t = fused_t = float("inf")
    for i in range(4):
        t0 = time.time()
        _ = codec2.decompress(streams2)
        ts_t = min(ts_t, time.time() - t0)
        t0 = time.time()
        _ = codec.decompress(streams)
        fused_t = min(fused_t, time.time() - t0)
        if i < 3:
            time.sleep(1.0)

    mp = H * W / 1e6
    wire_bytes = nbytes + img.size  # stream up + decoded image down
    result = {
        "image": f"{H}x{W}",
        "stream_bytes": nbytes,
        "bpsp": round(nbytes * 8 / img.size, 3),
        "wire_up_MBps_8M": round(up8, 1),
        "wire_down_MBps_8M": round(down8, 1),
        "device_decode_ms": round(dev_t * 1000, 1),
        "device_decode_MPps": round(mp / dev_t, 2),
        "e2e_latency_ms": round(e2e_t * 1000, 1),
        "pipelined_ms_per_img": round(pipe_t * 1000, 1),
        "pipelined_MPps": round(mp / pipe_t, 2),
        "wire_ms_estimate": round(
            (nbytes / (up8 * 1e6) + img.size / (down8 * 1e6)) * 1000, 1),
        "wire_bytes_per_img": wire_bytes,
        "device_only_vs_baseline": round(mp / dev_t / 0.60, 2),
        "pipelined_vs_baseline": round(mp / pipe_t / 0.60, 2),
        "two_stage_latency_ms": round(ts_t * 1000, 1),
        "fused_latency_ms_same_phase": round(fused_t * 1000, 1),
        "two_stage_head_frac": round(head_words / max(total_words, 1), 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
