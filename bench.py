#!/usr/bin/env python
"""Benchmark: codec round-trip throughput on the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric: sustained decode throughput in Mpixels/s on a 512x768
image (Kodak-size) with the bitstream resident in HBM and the decoded
image left in HBM — the serving steady state, and the number that does
not depend on this dev harness's tunnel (the TPU sits behind a tunnel
whose bandwidth swings 7-180 MB/s over multi-minute phases, so
end-to-end numbers here measure the tunnel as much as the chip; on a
production TPU host the same transfers ride PCIe at GB/s).  The JSON
line carries BOTH: `value`/`vs_baseline` = device-sustained, plus
`device_ms`, and the full e2e family (`e2e_*`) measured through the
tunnel for transparency.

Baseline: the reference decodes ~512x768 in ~0.65 s on a GPU + CPU
torchac => ~0.60 Mpixels/s (BASELINE.md, per-image log lines; timed at
reference agents/llicti_agent.py:135-149).
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    import jax
    import numpy as np

    # persistent compile cache: first-run compiles through the TPU tunnel
    # dominate wall-clock otherwise
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/llicti_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from llicti_tpu.codec import Codec
    from llicti_tpu.config import ModelConfig
    from llicti_tpu.data.dataset import synthetic_image
    from llicti_tpu.models.llicti import LLICTIModel

    H, W = 512, 768
    cfg = ModelConfig()
    model = LLICTIModel(cfg=cfg)
    import jax.numpy as jnp

    init_x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_x)
    meta = {}
    # use trained params when available (tools/train_corpus.py)
    ckpt_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_ckpt")
    try:
        from llicti_tpu.utils.checkpoint import CheckpointManager

        params, meta = CheckpointManager(ckpt_dir).load("bench", params)
        print(f"loaded trained bench params ({meta})", file=sys.stderr)
    except FileNotFoundError:
        pass
    on_tpu = jax.default_backend() == "tpu"
    # 1024 rANS lanes: halves the decode-scan step count vs 512 for
    # +0.26% stream size (lane-state flush) — measured on v5e, see
    # docs/PERF.md
    codec = Codec(cfg, params, use_pallas_cdf=on_tpu,
                  num_lanes=1024 if on_tpu else 512)
    # real photographic test image when the corpus is built (bpsp then
    # reflects the trained model on real data); synthetic fallback
    img = None
    test_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data_corpus", "test")
    if os.path.isdir(test_dir):
        try:
            from llicti_tpu.data.dataset import load_rgb

            for f in sorted(os.listdir(test_dir)):
                full = load_rgb(os.path.join(test_dir, f))
                if full.shape[0] >= H and full.shape[1] >= W:
                    img = np.ascontiguousarray(full[:H, :W])
                    print(f"bench image: {f} crop {img.shape}",
                          file=sys.stderr)
                    break
        except Exception:
            img = None
    if img is None or img.shape[:2] != (H, W):
        img = synthetic_image(H, W, seed=42)

    # warmup (compile)
    streams = codec.compress(img)
    out = codec.decompress(streams)
    ok = bool(np.array_equal(out[0], img))
    _ = codec.decompress_many([streams, streams])

    profile_dir = os.environ.get("LLICTI_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # ---- device-sustained (resident) throughput: the headline ---------
    # Streams staged in HBM once; M back-to-back program dispatches, one
    # sync.  Measures the chip + dispatch RPC, not the tunnel.
    # NOTE: jax.block_until_ready does NOT reliably wait for device
    # completion through the axon tunnel (docs/PERF.md methodology) —
    # every timed loop below ends with a VALUE FETCH of the last
    # output, which does wait; execution is in-order so the last
    # program's completion implies all prior ones.  The fetch costs ~1
    # RTT (~20 ms), amortized over M dispatches and subtracted via the
    # fetch-only baseline below.
    dec_fn = codec.prepare_decode(streams)
    _ = jax.device_get(dec_fn()[0, :1, 0, 0])  # warm
    M = 30  # deep queue: amortizes the tunnel's per-dispatch RPC pacing
    h = dec_fn()
    t0 = time.time()
    _ = jax.device_get(h[0, :1, 0, 0])
    fetch_rtt = time.time() - t0  # fetch-only cost on a ready buffer
    dev_dec_t = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(M):
            h = dec_fn()
        _ = jax.device_get(h[0, :1, 0, 0])
        dev_dec_t = min(dev_dec_t,
                        (time.time() - t0 - fetch_rtt) / M)
    enc_fn = codec.prepare_encode(img)
    _ = jax.device_get(enc_fn()[0][0, -1:])  # warm
    dev_enc_t = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(M):
            hs = enc_fn()
        _ = jax.device_get(hs[0][0, -1:])
        dev_enc_t = min(dev_enc_t,
                        (time.time() - t0 - fetch_rtt) / M)

    # ---- end-to-end family (through the tunnel) -----------------------
    # single-image latency: best of spaced attempts (each is one full
    # upload + program + download; spacing samples bandwidth phases).
    # The two-stage codec splits the decode at the finest scale: the
    # coarse scales dispatch on the stream PREFIX while the bulk of the
    # stream uploads (partial-stream decode) — measured alongside the
    # fused path in the same phase band; the headline latency is the
    # better of the two.
    codec_ts = Codec(cfg, params, use_pallas_cdf=on_tpu,
                     num_lanes=1024 if on_tpu else 512, two_stage=True)
    streams_ts = codec_ts.compress(img)  # warm (compile head/tail)
    ok = ok and bool(np.array_equal(codec_ts.decompress(streams_ts)[0], img))
    enc_t = dec_t = dec_ts_t = float("inf")
    for i in range(4):
        t0 = time.time()
        streams = codec.compress(img)
        enc_t = min(enc_t, time.time() - t0)
        t0 = time.time()
        out = codec.decompress(streams)
        dec_t = min(dec_t, time.time() - t0)
        t0 = time.time()
        _ = codec_ts.decompress(streams_ts)
        dec_ts_t = min(dec_ts_t, time.time() - t0)
        if i < 3:
            time.sleep(1.5)
    dec_best_t = min(dec_t, dec_ts_t)
    # pipelined: enqueue several full decodes (each re-uploads its stream
    # and recomputes everything), sync once.  best-of-N with short gaps:
    # the tunnel's bandwidth has multi-minute phases (7-180 MB/s
    # measured); back-to-back attempts all land in one phase and can
    # misreport steady-state 2x
    n_pipe = 6
    pipe_t = float("inf")
    for i in range(4):
        t0 = time.time()
        outs = codec.decompress_many([streams] * n_pipe)
        pipe_t = min(pipe_t, (time.time() - t0) / n_pipe)
        if i < 3:
            time.sleep(2.0)
    enc_pipe_t = float("inf")
    for i in range(3):
        t0 = time.time()
        streams_list = codec.compress_many([img] * n_pipe)
        enc_pipe_t = min(enc_pipe_t, (time.time() - t0) / n_pipe)
        if i < 2:
            time.sleep(2.0)
    # per-image accounting: compress_many populates one table per
    # pipelined image (codec.last_*_bits_batch); gate on image 0 (the
    # single-image est below is for one image) and verify the coder
    # closure holds for EVERY image of the pipelined call
    act_bits = sum(sum(row) for row in codec.last_slice_bits_batch[0])
    ideal_bits = sum(sum(row) for row in codec.last_ideal_bits_batch[0])
    per_img_gaps = [
        (sum(sum(r) for r in a) - sum(sum(r) for r in i))
        / max(sum(sum(r) for r in i), 1) * 100
        for a, i in zip(codec.last_slice_bits_batch,
                        codec.last_ideal_bits_batch)]
    # batch-container mode (K images, ONE K-batched executable both ways)
    # K=8 promoted from the round-5 lane/batch sweep (tools/
    # lane_experiment.py, docs/eval_r5/lane_sweep.json): 22.2 ms/img
    # device-sustained vs 24.0 at K=4, both lossless
    K = 8
    bstreams = codec.compress_batch([img] * K)  # warm
    bouts = codec.decompress_batch(bstreams)
    ok_batch = all(np.array_equal(o, img) for o in bouts)
    benc_t = bdec_t = float("inf")
    for _ in range(3):
        t0 = time.time()
        bstreams = codec.compress_batch([img] * K)
        benc_t = min(benc_t, (time.time() - t0) / K)
        t0 = time.time()
        bouts = codec.decompress_batch(bstreams)
        bdec_t = min(bdec_t, (time.time() - t0) / K)
    # resident batched decode: peak chip throughput for a same-size shard
    bdec_fn = codec.prepare_decode_batch(bstreams)
    _ = jax.device_get(bdec_fn()[0, :1, 0, 0])  # warm
    MB = 10
    dev_bdec_t = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(MB):
            h = bdec_fn()
        _ = jax.device_get(h[0, :1, 0, 0])
        dev_bdec_t = min(dev_bdec_t,
                         (time.time() - t0 - fetch_rtt) / (MB * K))
    if profile_dir:
        jax.profiler.stop_trace()
    ref_blob = Codec.serialize(streams)
    ok = (ok and all(np.array_equal(o[0], img) for o in outs)
          and all(Codec.serialize(s) == ref_blob for s in streams_list)
          and ok_batch)

    mp = H * W / 1e6
    bpsp = Codec.num_bytes(streams) * 8 / img.size
    baseline_dec_mps = 0.60  # reference: ~0.65 s for 512x768 (BASELINE.md)
    e2e_dec_mps = max(mp / pipe_t, mp / bdec_t)
    dev_dec_mps = mp / dev_dec_t

    # estimate-vs-actual rate cross-checks on the REAL weights (the
    # reference's third verification leg, rate_dist.py:97-135):
    # (a) full-range differentiable estimate vs coded bits, and
    # (b) two-sided coder closure: coded bits vs the exact code length
    #     of the quantized range-restricted tables (last_ideal_bits)
    est_fn = jax.jit(lambda p, x: sum(
        jnp.sum(si) for si in model.apply(p, x)))
    est_bits = float(est_fn(params, jnp.asarray(
        img[None].astype(np.float32) / 255.0)))
    gap_pct = (act_bits - est_bits) / max(est_bits, 1) * 100
    coder_gap_pct = (act_bits - ideal_bits) / max(ideal_bits, 1) * 100
    trained = "steps" in (meta if isinstance(meta, dict) else {})
    if trained and abs(gap_pct) > 2.0:
        print(f"FAIL: est-vs-actual rate gap {gap_pct:+.2f}% exceeds 2% "
              f"(est {est_bits/img.size:.4f} vs act "
              f"{act_bits/img.size:.4f} bpsp)", file=sys.stderr)
        sys.exit(1)
    # coder closure is model-independent (stream vs its own quantized
    # tables), so unlike the est/act gate above it runs unconditionally,
    # trained or not — and over every image of the pipelined call
    if any(abs(g) > 1.0 for g in [coder_gap_pct] + per_img_gaps):
        print(f"FAIL: coder closure gap exceeds 1% "
              f"(img0 {coder_gap_pct:+.2f}%, per-image "
              f"{[round(g, 2) for g in per_img_gaps]})", file=sys.stderr)
        sys.exit(1)

    print(
        f"DEVICE-SUSTAINED decode {dev_dec_mps:.2f} MP/s "
        f"({dev_dec_t*1000:.1f} ms/img) | "
        f"decode batched(K={K}) {mp/dev_bdec_t:.2f} MP/s "
        f"({dev_bdec_t*1000:.1f} ms/img) | encode {mp/dev_enc_t:.2f} MP/s "
        f"({dev_enc_t*1000:.1f} ms/img) || E2E-tunnel "
        f"encode {mp/enc_t:.2f} MP/s ({enc_t*1000:.0f} ms) | "
        f"encode pipelined {mp/enc_pipe_t:.2f} MP/s "
        f"({enc_pipe_t*1000:.0f} ms/img) | "
        f"encode batched(K={K}) {mp/benc_t:.2f} MP/s "
        f"({benc_t*1000:.0f} ms/img) | "
        f"decode latency {mp/dec_best_t:.2f} MP/s ({dec_best_t*1000:.0f} ms; "
        f"fused {dec_t*1000:.0f}, two-stage {dec_ts_t*1000:.0f}) | "
        f"decode pipelined {mp/pipe_t:.2f} MP/s ({pipe_t*1000:.0f} ms/img) | "
        f"decode batched(K={K}) {mp/bdec_t:.2f} MP/s "
        f"({bdec_t*1000:.0f} ms/img) || "
        f"bpsp {bpsp:.3f} | est/act gap {gap_pct:+.2f}% | "
        f"coder gap {coder_gap_pct:+.2f}% | lossless={ok} | "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "decode_throughput_512x768_device_sustained",
        "value": round(dev_dec_mps, 3),
        "unit": "Mpixels/s",
        "vs_baseline": round(dev_dec_mps / baseline_dec_mps, 2),
        "device_ms": round(dev_dec_t * 1000, 1),
        "device_batched_mps": round(mp / dev_bdec_t, 3),
        "device_batched_ms_per_img": round(dev_bdec_t * 1000, 1),
        "encode_device_mps": round(mp / dev_enc_t, 3),
        "encode_device_ms": round(dev_enc_t * 1000, 1),
        "e2e_decode_pipelined_mps": round(mp / pipe_t, 3),
        "e2e_decode_vs_baseline": round(e2e_dec_mps / baseline_dec_mps, 2),
        "e2e_decode_latency_ms": round(dec_best_t * 1000, 1),
        "e2e_decode_latency_fused_ms": round(dec_t * 1000, 1),
        "e2e_decode_latency_two_stage_ms": round(dec_ts_t * 1000, 1),
        "e2e_encode_pipelined_mps": round(mp / enc_pipe_t, 3),
        "e2e_note": "e2e includes the dev harness TPU tunnel "
                    "(7-180 MB/s phases); production hosts ride PCIe",
        "bpsp": round(bpsp, 4),
        "lossless": ok,
    }))


if __name__ == "__main__":
    main()
