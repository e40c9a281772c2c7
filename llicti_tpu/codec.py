"""Lossless codec: compress/decompress orchestration.

TPU-native re-design of the reference's codec path
(graphs/models/LLICTI_nets.py:125-179, 344-509), with two entropy-coding
backends:

* ``backend="device"`` (default): on-device interleaved rANS
  (coder/rans_device.py).  CDF tables never leave HBM; the only
  host<->device traffic is the entropy-sized bitstream plus the tiny
  raw header band.  One chained stream per image (the 45 slices share
  lane states), so overhead is a single N*4-byte state flush.
* ``backend="host"``: C++ arithmetic coder with torchac's uint16-CDF
  contract (coder/__init__.py) — the reference-parity path.  Encode
  gathers (cdf[s], cdf[s+1]) on device (2 uint16/pixel transferred);
  decode ships full CDF tables and fans streams across a thread pool.

Bit-exactness invariant (SURVEY.md §7 "hard parts"): the encoder and the
decoder call the *same jitted programs* for NN parameter maps and CDF
tables, at identical granularity — XLA is deterministic per compiled
program, so both sides see identical CDFs.  Everything else that both
sides compute (int<->float conversions, padding, interleaves) is either
integer/copy ops or a single IEEE multiply, which fusion cannot change.

Bitstream layout (ours):
  streams[0] = [header, minmax_int16, pad_int16, raw_x00_rgb, b''*5]
  device backend: streams[1] = [rans blob]
  host backend:   streams[1..S] = 9 range-coded streams per scale
                  (coarse->fine, index b*3+clr, like the reference).
"""
from __future__ import annotations

import concurrent.futures as futures
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import coder
from .coder import rans_device as rd
from .config import ModelConfig
from .models.llicti import LLICTIModel
from .ops.cdf_pallas import gmm_cdf_from_pmap_pallas
from .ops.color import (
    rgb_int_to_ycocg_r_int,
    rgb_int_to_ycocg_r_int_np,
    ycocg_r_int_to_rgb_int,
)
from .ops.gmm import cdf_float_to_uint16, cdf_sampling_points, gmm_cdf_table
from .ops.wavelet import (
    band_coded_shape,
    interleave_scale,
    lazy_dwt,
    pad_decoded_band,
    unpack_pad_flags,
)

RANGE_BUCKET = 32
INV255 = np.float32(1.0 / 255.0)


def sym_channel(cfg: ModelConfig, b: int, clr: int) -> int:
    """Channel of color ``clr`` of band ``b`` inside a y_lev tensor."""
    c = cfg.cond_channels
    clr_off = 1 if cfg.clr_joint_mode == 1 else 0
    return c * (b + 1) + clr_off + clr


def gmm_slice_params(cfg: ModelConfig, pmap, y_lev, b: int, clr: int):
    """Slice one color's mixture params + cross-color mean updates.

    Shared by the single-chip and sharded codecs so both use one
    implementation of the reference's param channel layouts per
    clr_joint_mode (LLICTI_nets.py:827-935).
    """
    M = cfg.num_mixtures
    if cfg.clr_joint_mode == 0:
        stdevs = pmap[..., 3 * clr * M:(3 * clr + 1) * M]
        means = pmap[..., (3 * clr + 1) * M:(3 * clr + 2) * M]
        weights = pmap[..., (3 * clr + 2) * M:(3 * clr + 3) * M]
        return stdevs, means, weights
    if cfg.clr_joint_mode == 1:
        if clr == 0:  # Y uses 2M mixtures
            return (pmap[..., 2 * M:4 * M], pmap[..., 4 * M:6 * M],
                    pmap[..., 6 * M:8 * M])
        i = clr - 1  # Co, Cg share m-major [8M:10M]... blocks
        stdevs = pmap[..., (8 + i) * M:(9 + i) * M]
        means = pmap[..., (10 + i) * M:(11 + i) * M]
        weights = pmap[..., (12 + i) * M:(13 + i) * M]
        if clr == 2:  # mean_Cg += a * Co (decoded)
            ch = sym_channel(cfg, b, 1)
            y_co = y_lev[..., ch:ch + 1]
            means = means + pmap[..., 14 * M:15 * M] * y_co
        return stdevs, means, weights
    ch0 = sym_channel(cfg, b, 0)
    ch1 = sym_channel(cfg, b, 1)
    y0 = y_lev[..., ch0:ch0 + 1]
    y1 = y_lev[..., ch1:ch1 + 1]
    stdevs = pmap[..., clr * M:(clr + 1) * M]
    means = pmap[..., (3 + clr) * M:(3 + clr + 1) * M]
    weights = pmap[..., (6 + clr) * M:(6 + clr + 1) * M]
    if clr == 1:
        means = means + pmap[..., 9 * M:10 * M] * y0
    elif clr == 2:
        means = means + (pmap[..., 10 * M:11 * M] * y0
                         + pmap[..., 11 * M:12 * M] * y1)
    return stdevs, means, weights


def pmap_cdf_spec(cfg: ModelConfig, b: int, clr: int):
    """(M_eff, std0, mean0, w0, upd) column spec into the raw pmap —
    the in-kernel equivalent of :func:`gmm_slice_params` for the
    from-pmap Pallas CDF kernel (reference layouts LLICTI_nets.py:827-935).
    ``upd`` holds (coef_col, y_channel) cross-color mean updates."""
    M = cfg.num_mixtures
    if cfg.clr_joint_mode == 0:
        return (M, 3 * clr * M, (3 * clr + 1) * M, (3 * clr + 2) * M, ())
    if cfg.clr_joint_mode == 1:
        if clr == 0:
            return (2 * M, 2 * M, 4 * M, 6 * M, ())
        i = clr - 1
        upd = ((14 * M, sym_channel(cfg, b, 1)),) if clr == 2 else ()
        return (M, (8 + i) * M, (10 + i) * M, (12 + i) * M, upd)
    ch0 = sym_channel(cfg, b, 0)
    ch1 = sym_channel(cfg, b, 1)
    upd = ()
    if clr == 1:
        upd = ((9 * M, ch0),)
    elif clr == 2:
        upd = ((10 * M, ch0), (11 * M, ch1))
    return (M, clr * M, (3 + clr) * M, (6 + clr) * M, upd)


def bucket_range(min_val: int, max_val: int) -> Tuple[int, int]:
    """Round a symbol range outward to RANGE_BUCKET multiples (keeps the
    jit cache small; the near-zero-probability extra bins cost <0.002
    bits/sym)."""
    lo = (min_val // RANGE_BUCKET) * RANGE_BUCKET
    hi = -((-(max_val + 1)) // RANGE_BUCKET) * RANGE_BUCKET - 1
    return int(lo), int(hi)


def dense_group_params(params, cfg: ModelConfig):
    """Expand grouped conv kernels to block-diagonal dense kernels.

    The codec runs the interpolators with dense_groups=True (full
    128-lane MXU contractions instead of 88-channel groups); the
    zero-blocks contribute exact 0.0 terms so the math is the grouped
    conv's.  Host-side numpy transform of the ~196K-param tree.
    """
    from .models.llicti import model_scales

    owners = model_scales(cfg)

    def expand(kernel: np.ndarray, groups: int) -> np.ndarray:
        if groups == 1:
            return kernel
        kh, kw, gin, co = kernel.shape
        gout = co // groups
        out = np.zeros((kh, kw, gin * groups, co), kernel.dtype)
        for g in range(groups):
            out[:, :, g * gin:(g + 1) * gin, g * gout:(g + 1) * gout] = \
                kernel[:, :, :, g * gout:(g + 1) * gout]
        return out

    from .models.interpolator import interpolator_dims

    p = jax.tree.map(np.asarray, jax.device_get(params))
    root = p["params"]
    for name, sub in root.items():
        if not name.startswith("models_"):
            continue
        m = int(name.split("_")[1])
        grps, _Ch, _Co, _c, grp0 = interpolator_dims(cfg, owners[m])
        for conv_name, conv_sub in sub.items():
            if conv_name.startswith("trunk"):
                groups = grps
            elif conv_name.startswith("conv_"):
                groups = grp0
            else:
                continue
            leaf = conv_sub["Conv_0"]
            leaf["kernel"] = expand(leaf["kernel"], groups)
    return p


def pad_flags_for_shape(h: int, w: int, levels: Sequence[int]):
    """Pad flags are purely shape-derived; compute without touching data."""
    flags = []
    pad_int = 0
    for lev in range(0, max(levels) + 1):
        if lev not in levels:
            continue
        st = 2 ** (lev + 1)
        of = st // 2
        h00 = -(-h // st)
        w00 = -(-w // st)
        h11 = (h - of + st - 1) // st
        w11 = (w - of + st - 1) // st
        padH, padW = h00 > h11, w00 > w11
        flags.append((padH, padW))
        pad_int = 4 * pad_int + 2 * int(padH) + int(padW)
    return flags, pad_int


class Codec:
    """Encoder/decoder around a trained LLICTIModel.

    Supported configs: clrchs=3 with clr_joint_mode 0/1/2 (incl.
    clrjnt0seqmd sequential-color conditioning), normal or logistic
    mixtures.  The reference's coder handles only the clrjnt=2 normal
    subset (LLICTI_nets.py:937-939); the other modes entropy-code here
    as extensions.  Not coded (rate-estimation-only knobs, matching the
    reference): subtract_mean, ycocg=False, clrchs<3.
    """

    def __init__(self, cfg: ModelConfig, params, backend: str = "device",
                 num_lanes: int = 512, num_threads: int = 8,
                 use_pallas_cdf: bool = False,
                 size_bucket: int = 0, two_stage: bool = False):
        assert cfg.clrchs == 3 and cfg.clr_joint_mode in (0, 1, 2), (
            "codec path requires clrchs=3 (reference codes only clrjnt=2; "
            "clrjnt 0/1 + seqmd coding are extensions beyond the reference)")
        seqmd = cfg.clr_joint_mode == 0 and cfg.clrjnt0seqmd
        if seqmd:
            assert backend == "device", "seqmd codes via the device backend"
            assert cfg.activfun != "GDN1", (
                "GDN1 couples channel groups; seqmd coding needs an "
                "elementwise activation for per-color causality")
        assert cfg.distribution in ("normal", "logistic")
        assert cfg.num_mixtures > 1
        assert cfg.ycocg, "codec path requires ycocg=True"
        assert not cfg.subtract_mean, (
            "subtract_mean is a training/rate-estimation variant; the "
            "codec path does not code it (reference get_params likewise, "
            "LLICTI_nets.py:820-825)")
        assert backend in ("device", "host")
        if size_bucket:
            # pad-to-bucket compile strategy (SURVEY §7 hard part #4): a
            # ragged eval set compiles one program family per BUCKETED
            # shape instead of per exact shape.  Bucket must be a multiple
            # of the last scale's stride so pad flags vanish.
            mult = 2 ** (max(cfg.dwtlevels) + 1)
            assert size_bucket % mult == 0, (
                f"size_bucket must be a multiple of {mult}")
        self.size_bucket = size_bucket
        if two_stage:
            assert backend == "device" and cfg.num_scales >= 2, (
                "two_stage splits the device program at the finest scale")
        self.two_stage = two_stage
        self.compiled_shapes: set = set()
        self.cfg = cfg
        # dense block-diagonal execution of the grouped convs (same math,
        # full MXU contractions — see dense_group_params)
        self.params = dense_group_params(params, cfg)
        self.backend = backend
        self.N = num_lanes
        self.model = LLICTIModel(cfg=cfg, dense_groups=True)
        self.pool = futures.ThreadPoolExecutor(max_workers=num_threads)
        self.last_slice_bits: Optional[List[List[int]]] = None
        # per-image tables from the last compress_batch call
        self.last_slice_bits_batch: Optional[List[List[List[int]]]] = None
        # range-restricted ideal code length (from the quantized tables
        # the coder uses) for the last compress/compress_batch call
        self.last_ideal_bits: Optional[List[List[float]]] = None
        self.last_ideal_bits_batch: Optional[List[List[List[float]]]] = None

        M = cfg.num_mixtures
        c = cfg.cond_channels  # 3 for clrjnt 0/2, 4 for clrjnt 1 (zero ch)
        clr_off = 1 if cfg.clr_joint_mode == 1 else 0
        logistic = cfg.distribution == "logistic"
        # the from-pmap Pallas kernel covers every coded mode (clrjnt
        # 0/1/2 incl. seqmd, normal + logistic)
        self._c = c
        self._clr_off = clr_off

        def sym_ch(b, clr):
            return sym_channel(cfg, b, clr)

        self._sym_ch = sym_ch

        # ---- shared jitted programs (both directions call these with the
        # ---- same shapes; the jit cache makes them the same executables).
        # ---- Conditioning slices happen *inside* the programs: every eager
        # ---- op is a host round-trip on the TPU tunnel.
        @partial(jax.jit, static_argnums=(2, 3))
        def band_params_fn(params_, y_lev, scl, b):
            return self.model.apply(params_, y_lev[..., 0:c * (b + 1)],
                                    scl, b, method=LLICTIModel.band_params)

        def _cdf_float(pmap, y_lev, b, clr, pts):
            stdevs, means, weights = _gmm_params(pmap, y_lev, b, clr)
            return gmm_cdf_table(pts, stdevs, means, weights,
                                 logistic=logistic)

        @partial(jax.jit, static_argnums=(3, 4))
        def cdf_u16_fn(pmap, y_lev, pts, b, clr):
            """[1,h,w,P] uint16 table (host-backend contract)."""
            return cdf_float_to_uint16(
                _cdf_float(pmap, y_lev, b, clr, pts))

        def _gmm_params(pmap, y_lev, b, clr):
            return gmm_slice_params(cfg, pmap, y_lev, b, clr)

        def _cdf_cum(pmap, y_lev, b, clr, pts, minv):
            """[K,h,w,P] int32 cum table (+ encoder (start, freq) maps on
            the Pallas path, else None) — device-backend contract.

            ``pts`` MUST be a runtime operand, not a trace-time constant:
            a constant-folded sampling grid becomes a program literal
            whose per-grid-step DMA into the Pallas kernel is ~400x
            slower on this backend (measured 24 ms vs 0.06 ms for one
            [98304, 257] table).
            """
            if use_pallas_cdf:
                # from-pmap kernel: consumes the conv output in its
                # natural channel-minor layout — param slicing, bounds
                # and cross-color mean updates happen in VMEM (no
                # [n, M]-shaped HBM operands that stall on relayout DMAs)
                Mx, std0, mean0, w0, upd = pmap_cdf_spec(cfg, b, clr)
                return gmm_cdf_from_pmap_pallas(
                    pts, pmap, y_lev, Mx, std0, mean0, w0, upd, logistic,
                    sym_ch(b, clr), minv)
            cum = rd.cdf_float_to_cum_int32(
                _cdf_float(pmap, y_lev, b, clr, pts))
            return cum, None, None

        # ---- per-band traceable body (composed into the image program) -----
        # conv -> 3x(CDF table -> (start,freq) extraction [encode, cond] ->
        # rANS decode scan [decode, cond] -> write-back select).
        def _band_body(params_, y_lev, words, states, offset, enable, sf,
                       scl, b, padH, padW, ranges, pts3, num_lanes):
            """Batch-generic: y_lev [K,h,w,4c], words [K,cap],
            states [K,N], offset [K].  pts3: per-color runtime sampling
            grids (see _cdf_cum)."""
            if seqmd:
                base = self.model.apply(params_, y_lev[..., 0:c * (b + 1)],
                                        scl, b, method=LLICTIModel.band_base)
            else:
                pmap = self.model.apply(params_, y_lev[..., 0:c * (b + 1)],
                                        scl, b,
                                        method=LLICTIModel.band_params)
            K, h, w = y_lev.shape[0], y_lev.shape[1], y_lev.shape[2]
            ch_, cw = band_coded_shape(h, w, b, padH, padW)
            n = ch_ * cw
            bucket = max(64, -(-n // 4096) * 4096)
            on = enable > 0
            for clr in range(3):
                if seqmd:
                    # per-color params: the current pixel's earlier
                    # (decoded) colors feed this color's channel groups
                    y_seq = y_lev[..., sym_ch(b, 0):sym_ch(b, 0) + 2]
                    pmap = self.model.apply(
                        params_, base, y_seq, scl, b, clr,
                        method=LLICTIModel.band_params_seq)
                minv, maxv = ranges[clr]
                cum, kst, kfr = _cdf_cum(pmap, y_lev, b, clr, pts3[clr],
                                         minv)
                cc = cum[:, :ch_, :cw]
                padn = ((0, 0), (0, bucket - n))
                if kst is not None:
                    # Pallas path: (start, freq) came out of the CDF
                    # kernel itself (one masked reduction in VMEM); crop
                    # the pad row/col and bucket-pad (freq 0 = no-op)
                    st_arr = jnp.pad(
                        kst[:, :ch_, :cw].reshape(K, -1), padn)
                    fr_arr = jnp.pad(
                        kfr[:, :ch_, :cw].reshape(K, -1), padn)
                else:
                    # XLA path: look up (start, freq) at the true
                    # symbols via one-hot masked sums (gathers are slow
                    # on TPU); skipped under cond when decoding
                    def enc_sf(cc, b=b, clr=clr, minv=minv, ch_=ch_,
                               cw=cw, n=n, bucket=bucket):
                        yv = y_lev[:, :ch_, :cw, sym_ch(b, clr)]
                        sym = jnp.round(yv * 255.0).astype(jnp.int32) - minv
                        sym = jnp.clip(sym, 0, cc.shape[-1] - 2)[..., None]
                        iota = jnp.arange(cc.shape[-1], dtype=jnp.int32)
                        lo = jnp.sum(jnp.where(iota == sym, cc, 0), axis=-1)
                        hi = jnp.sum(jnp.where(iota == sym + 1, cc, 0),
                                     axis=-1)
                        return (jnp.pad(lo.reshape(K, -1), padn),
                                jnp.pad((hi - lo).reshape(K, -1), padn))

                    def no_sf(cc, bucket=bucket):
                        z = jnp.zeros((K, bucket), jnp.int32)
                        return z, z

                    st_arr, fr_arr = jax.lax.cond(on, no_sf, enc_sf, cc)
                sf.append(st_arr)
                sf.append(fr_arr)
                # decode-side: rANS scan under cond (skipped when encoding)
                cum2 = cc.reshape(K, n, -1)

                def dec(args, cum2=cum2, n=n):
                    w_, s_, o_ = args
                    return rd.rans_decode_body_batch(cum2, w_, s_, o_,
                                                     num_lanes, n)

                def skip(args, n=n):
                    _w, s_, o_ = args
                    return jnp.zeros((K, n), jnp.int32), s_, o_

                syms, states, offset = jax.lax.cond(
                    on, dec, skip, (words, states, offset))
                vals = (syms.reshape(K, ch_, cw) + minv).astype(
                    jnp.float32) * INV255
                vals = pad_decoded_band(vals[..., None], b, padH, padW)[..., 0]
                cur = y_lev[..., sym_ch(b, clr)]
                y_lev = y_lev.at[..., sym_ch(b, clr)].set(
                    jnp.where(on, vals, cur))
            return y_lev, states, offset

        # ---- fused whole-IMAGE program --------------------------------------
        # ONE executable decodes (or encodes) the entire image: for every
        # scale coarse->fine, (raw-band init OR interleave of the previous
        # scale) -> conv -> 9x(CDF table -> rANS decode -> write-back),
        # then the final inverse color transform, and — encode side — the
        # chained rANS encode of all 45 slices in reverse decode order.
        # Both directions call the SAME executable (enable selects at
        # runtime): the decoder skips the (start,freq) extraction and the
        # encode chain under lax.cond, the encoder skips the decode scans.
        # Encoder and decoder therefore compute every CDF in the same
        # compiled program — bit-exactness by construction (SURVEY.md §7
        # "hard parts") — and a full decode is TWO dispatches (stream pad +
        # this program) vs the reference's 90 host crossings: on a tunneled
        # TPU the per-dispatch RPC dominates, so one big program wins for
        # latency (decomposition in docs/PERF.md).
        #
        # A second program FAMILY splits the same pipeline at the finest
        # scale (two_stage=True): head = scales S-1..1, tail = scale 0 +
        # chain.  Decode order is coarse->fine, so the head consumes only
        # a shape-derived PREFIX of the stream — the tail's words (the
        # bulk) upload while the head computes (partial-stream decode;
        # VERDICT r4 task #4).  A two_stage instance uses the pair for
        # BOTH directions, preserving the same-executable CDF invariant
        # within the instance (like num_lanes, the program family is an
        # encoder/decoder-matched codec parameter).

        def _scales_chain(params_, x00_raw, y_prev, y_direct, base, words,
                          states, offset, enable, sf, scls, pts3,
                          pad_flags_t, ranges, num_lanes, shift, on):
            """Shared traced body: process ``scls`` (descending) scales.
            y_direct[scl - base] is the encoder's precomputed y_list entry
            (dummy zeros when decoding); y_prev seeds the interleave when
            the coarsest processed scale is not S-1.  shift/on are the
            caller's traced values (created ONCE per program, preserving
            the fused program's op order — and therefore its persistent
            compile-cache key — across this refactor)."""
            S = cfg.num_scales
            K = x00_raw.shape[0]
            y_lev = y_prev
            for scl in scls:
                if scl == S - 1:
                    ycocg = rgb_int_to_ycocg_r_int(x00_raw.astype(jnp.int32))
                    x00 = (ycocg - shift).astype(jnp.float32) * INV255
                    h, w = x00.shape[1], x00.shape[2]
                    y0 = jnp.zeros((K, h, w, 4 * c), jnp.float32)
                    y0 = y0.at[..., clr_off:clr_off + 3].set(x00)
                else:
                    prev_crop = (int(pad_flags_t[scl + 1][0]),
                                 int(pad_flags_t[scl + 1][1]))
                    x00 = interleave_scale(y_lev, c, prev_crop[0],
                                           prev_crop[1])
                    h, w = x00.shape[1], x00.shape[2]
                    y0 = jnp.zeros((K, h, w, 4 * c), jnp.float32)
                    y0 = y0.at[..., 0:c].set(x00)
                y_lev = jnp.where(on, y0, y_direct[scl - base])
                padH, padW = pad_flags_t[scl]
                for b in range(3):
                    y_lev, states, offset = _band_body(
                        params_, y_lev, words, states, offset, enable, sf,
                        scl, b, padH, padW, ranges, pts3, num_lanes)
            return y_lev, states, offset

        def _finalize_rgb(y_lev, pad_flags_t, shift):
            """Final interleave + inverse color transform."""
            y_c = interleave_scale(y_lev, c, int(pad_flags_t[0][0]),
                                   int(pad_flags_t[0][1]))
            y_3ch = y_c[..., clr_off:clr_off + 3]
            ycocg = jnp.round(y_3ch * 255.0).astype(jnp.int32) + shift
            return ycocg_r_int_to_rgb_int(ycocg).astype(jnp.uint8)

        def _chain_and_ideal(sf, on, K, capw, num_lanes):
            """Encode side: chained rANS encode of all slices in reverse
            decode order (integer-only, so no float-determinism hazard;
            skipped at runtime on decode), plus the per-slice IDEAL code
            length from the quantized tables the coder actually uses:
            sum -log2(freq/2^16) over real symbols (freq 0 marks bucket
            padding).  The ideal is the range-restricted estimate —
            against (a) the model's full-range differentiable estimate it
            isolates the per-image dynamic-range saving, against (b) the
            actual stream it isolates rANS overhead (lane flush + renorm
            quantization).  Decode-side: zeros (sf skipped under cond)."""
            n_slices = len(sf) // 2

            def do_chain(sf_flat):
                buf = jnp.zeros((K, capw), jnp.int32)
                enc_states = jnp.full((K, num_lanes), rd.RANS_L, jnp.uint32)
                cursor = jnp.zeros((K,), jnp.int32)
                cursors = []
                pairs = list(zip(sf_flat[0::2], sf_flat[1::2]))
                for st_arr, fr_arr in reversed(pairs):
                    buf, cursor, enc_states = rd.rans_encode_body_batch(
                        st_arr, fr_arr, enc_states, cursor, buf, num_lanes)
                    cursors.append(cursor)
                return buf, jnp.stack(cursors, axis=1), enc_states

            def skip_chain(sf_flat):
                return (jnp.zeros((K, capw), jnp.int32),
                        jnp.zeros((K, n_slices), jnp.int32),
                        jnp.full((K, num_lanes), rd.RANS_L, jnp.uint32))

            buf, cursors, enc_states = jax.lax.cond(
                on, skip_chain, do_chain, tuple(sf))
            ideal = []
            for st_arr, fr_arr in zip(sf[0::2], sf[1::2]):
                fr_f = jnp.maximum(fr_arr, 1).astype(jnp.float32)
                bits = jnp.sum(
                    jnp.where(fr_arr > 0,
                              np.float32(16.0) - jnp.log2(fr_f), 0.0),
                    axis=1)
                ideal.append(bits)
            ideal_bits = jnp.stack(ideal, axis=1)  # [K, n_slices] dec order
            return buf, cursors, enc_states, ideal_bits

        @partial(jax.jit, static_argnums=(7, 8, 9))
        def image_fn(params_, x00_raw, y_direct, words, states, enable,
                     pts3, pad_flags_t, ranges, num_lanes):
            """Batch-generic over a leading K axis (K=1 for single images;
            batched encode/decode shares the convs' batch dimension and one
            scan per slice — each image still gets its own independent
            rANS stream).

            x00_raw: [K, lh, lw, 3] uint8 raw header bands.  y_direct:
            per-scale tuple indexed by scl — the encoder's precomputed
            y_list ([K, h, w, 4c]; dummy zeros when decoding).
            words/states: the decoders' stream buffers [K, cap] + header
            lane states [K, N] (dummies when encoding).  Returns (finest
            y_lev, rgb [K,H,W,3], enc stream buffers [K, cap], enc
            per-slice cursors [K, n_slices] in encode order, enc final
            lane states [K, N])."""
            S = cfg.num_scales
            K = x00_raw.shape[0]
            shift = jnp.array([127, 0, 0], jnp.int32)
            on = enable > 0
            offset = jnp.zeros((K,), jnp.int32)
            sf = []
            y_lev, states, _off = _scales_chain(
                params_, x00_raw, None, y_direct, 0, words, states, offset,
                enable, sf, tuple(range(S - 1, -1, -1)), pts3, pad_flags_t,
                ranges, num_lanes, shift, on)
            rgb = _finalize_rgb(y_lev, pad_flags_t, shift)
            buf, cursors, enc_states, ideal_bits = _chain_and_ideal(
                sf, on, K, words.shape[1], num_lanes)
            return y_lev, rgb, buf, cursors, enc_states, ideal_bits

        @partial(jax.jit, static_argnums=(7, 8, 9))
        def head_fn(params_, x00_raw, y_direct_h, words_h, states, enable,
                    pts3, pad_flags_t, ranges, num_lanes):
            """Two-stage stage 1: scales S-1..1 on the stream PREFIX
            (words_h: [K, cap_head], shape-derived worst case for the
            coarse scales).  Returns the scale-1 tensor + rANS cursor
            state + the (start, freq) stacks for the encoder's chain."""
            S = cfg.num_scales
            K = x00_raw.shape[0]
            shift = jnp.array([127, 0, 0], jnp.int32)
            on = enable > 0
            offset = jnp.zeros((K,), jnp.int32)
            sf = []
            y_lev, states, offset = _scales_chain(
                params_, x00_raw, None, y_direct_h, 1, words_h, states,
                offset, enable, sf, tuple(range(S - 1, 0, -1)), pts3,
                pad_flags_t, ranges, num_lanes, shift, on)
            return y_lev, states, offset, tuple(sf)

        @partial(jax.jit, static_argnums=(9, 10, 11))
        def tail_fn(params_, y1, y_direct0, words, states, offset, enable,
                    sf_head, pts3, pad_flags_t, ranges, num_lanes):
            """Two-stage stage 2: scale 0 on the FULL words buffer
            (continuing at the head's offset — the head buffer is a
            prefix of it), final color transform, and the full-image
            encode chain + ideal bits over head+tail slices."""
            K = y1.shape[0]
            shift = jnp.array([127, 0, 0], jnp.int32)
            on = enable > 0
            sf = list(sf_head)
            y_lev, states, _off = _scales_chain(
                params_, y1, y1, (y_direct0,), 0, words, states, offset,
                enable, sf, (0,), pts3, pad_flags_t, ranges, num_lanes,
                shift, on)
            rgb = _finalize_rgb(y_lev, pad_flags_t, shift)
            buf, cursors, enc_states, ideal_bits = _chain_and_ideal(
                sf, on, K, words.shape[1], num_lanes)
            return y_lev, rgb, buf, cursors, enc_states, ideal_bits

        # ---- front end (encode): one program per image shape -------------
        # input is uint8 (1 B/subpixel on the host link); int cast on device
        @partial(jax.jit, static_argnums=(1,))
        def front_fn(rgb_u8, levels):
            """Batch-generic: rgb_u8 [K,H,W,3] -> (y_list, minmax [K,6]
            rows of (min_y, max_y, min_co, max_co, min_cg, max_cg), raw
            bands)."""
            rgb_int = rgb_u8.astype(jnp.int32)
            ycocg = rgb_int_to_ycocg_r_int(rgb_int)
            mm = jnp.stack(
                [jnp.min(ycocg[..., 0], axis=(1, 2)),
                 jnp.max(ycocg[..., 0], axis=(1, 2)),
                 jnp.min(ycocg[..., 1], axis=(1, 2)),
                 jnp.max(ycocg[..., 1], axis=(1, 2)),
                 jnp.min(ycocg[..., 2], axis=(1, 2)),
                 jnp.max(ycocg[..., 2], axis=(1, 2))], axis=-1)
            shift = jnp.array([127, 0, 0], jnp.int32)
            x = (ycocg - shift).astype(jnp.float32) * INV255
            if clr_off:
                zrs = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
                x = jnp.concatenate([zrs, x], axis=-1)
            last_stride = 2 ** (max(levels) + 1)
            x00_raw = rgb_int[:, ::last_stride, ::last_stride, :].astype(
                jnp.uint8)
            y_list, _, _ = lazy_dwt(x, levels, pad=True)
            return tuple(y_list), mm, x00_raw

        # ---- host-backend per-slice programs --------------------------------
        @partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
        def gather_lohi_fn(cdfu, y_lev, b, clr, ch, cw, minv):
            """Host-backend encode transfer: 2 uint16 per pixel."""
            y = y_lev[:, :ch, :cw, sym_ch(b, clr)]
            sym = (jnp.round(y * 255.0).astype(jnp.int32) - minv)
            s = sym[..., None]
            cc = cdfu[:, :ch, :cw]
            lo = jnp.take_along_axis(cc, s, axis=-1)[..., 0]
            hi = jnp.take_along_axis(cc, s + 1, axis=-1)[..., 0]
            return lo, hi

        @partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 8))
        def writeback_fn(y_lev, b, clr, padH, padW, ch, cw, syms, minv):
            """Decoded symbols -> float channel of y_lev (host backend)."""
            vals = (syms.reshape(1, ch, cw) + minv).astype(jnp.float32) * INV255
            vals = pad_decoded_band(vals[..., None], b, padH, padW)
            y_lev = y_lev.at[..., sym_ch(b, clr)].set(vals[..., 0])
            return y_lev

        @partial(jax.jit, static_argnums=(1, 2))
        def next_scale_fn(y_lev, crop_h, crop_w):
            """Interleave a finished scale into the next finer x00."""
            x00 = interleave_scale(y_lev, c, crop_h, crop_w)
            h, w = x00.shape[1], x00.shape[2]
            out = jnp.zeros((1, h, w, 4 * c), jnp.float32)
            return out.at[..., 0:c].set(x00)

        @jax.jit
        def init_scale_fn(raw_rgb_uint8):
            """Raw RGB header band -> coarsest y_lev (ycocg + shift, all on
            device — no host round trip)."""
            ycocg = rgb_int_to_ycocg_r_int(raw_rgb_uint8.astype(jnp.int32))
            shift = jnp.array([127, 0, 0], jnp.int32)
            x00 = (ycocg - shift).astype(jnp.float32) * INV255
            h, w = x00.shape[1], x00.shape[2]
            out = jnp.zeros((1, h, w, 4 * c), jnp.float32)
            return out.at[..., clr_off:clr_off + 3].set(x00)

        @partial(jax.jit, static_argnums=(1,))
        def pad_words_fn(w, cap):
            """Small upload [K, up] -> fixed worst-case-shaped stream
            buffers [K, cap], so the decode program's shapes depend only on
            the image shape (a stream-length-dependent shape would
            recompile the big program whenever the compressed size
            changes)."""
            return jnp.zeros((w.shape[0], cap), w.dtype).at[
                :, : w.shape[1]].set(w)

        @partial(jax.jit, static_argnums=(1,))
        def slice_words_fn(w, cap):
            """Full words buffer -> its head prefix (two-stage resident
            paths, where the whole stream is already in HBM)."""
            return w[:, :cap]

        @partial(jax.jit, static_argnums=(2,))
        def concat_pad_fn(a, b, cap):
            """Two uploaded pieces -> the full worst-case words buffer
            (two-stage split upload: b lands while the head computes)."""
            out = jnp.zeros((a.shape[0], cap), a.dtype)
            out = out.at[:, : a.shape[1]].set(a)
            return out.at[:, a.shape[1]: a.shape[1] + b.shape[1]].set(b)

        @partial(jax.jit, static_argnums=(1, 2))
        def postprocess_fn(y_lev, crop_h, crop_w):
            """Final interleave + inverse color transform, fully on device."""
            y_c = interleave_scale(y_lev, c, crop_h, crop_w)
            y_3ch = y_c[..., clr_off:clr_off + 3]
            ycocg = jnp.round(y_3ch * 255.0).astype(jnp.int32) + jnp.array(
                [127, 0, 0], jnp.int32)
            return ycocg_r_int_to_rgb_int(ycocg).astype(jnp.uint8)

        @partial(jax.jit, static_argnums=(2, 3))
        def ycocg_err_fn(y_lev, xorg_u8, crop_h, crop_w):
            """Pre-color-transform decode check (reference
            LLICTI_nets.py:168-171, decompres(..., xorg)): max abs error
            between decoded YCoCg ints and the transform of the original,
            isolating coder bugs from inverse-color-transform bugs."""
            y_c = interleave_scale(y_lev, c, crop_h, crop_w)
            y_3ch = y_c[..., clr_off:clr_off + 3]
            ycocg_dec = jnp.round(y_3ch * 255.0).astype(jnp.int32) + \
                jnp.array([127, 0, 0], jnp.int32)
            ycocg_org = rgb_int_to_ycocg_r_int(xorg_u8.astype(jnp.int32))
            return jnp.max(jnp.abs(ycocg_dec - ycocg_org))

        self._band_params = band_params_fn
        self._cdf_u16 = cdf_u16_fn
        self._image_fn = image_fn
        self._head_fn = head_fn
        self._tail_fn = tail_fn
        self._slice_words = slice_words_fn
        self._concat_pad = concat_pad_fn
        self._front = front_fn
        self._gather_lohi = gather_lohi_fn
        self._writeback = writeback_fn
        self._next_scale = next_scale_fn
        self._init_scale = init_scale_fn
        self._pad_words = pad_words_fn
        self._postprocess = postprocess_fn
        self._ycocg_err = ycocg_err_fn
        self._last_y_lev = None  # finest decoded scale (for xorg check)
        # read-only constant device buffers (dummy words/states, scalar
        # flags), cached so steady-state encode/decode dispatches no
        # buffer-creation ops
        self._const_cache: Dict = {}
        # speculative encode-finalize prefix: last stream word count per
        # worst-case cap, so the payload fetch can ride the same sync as
        # the cursors (one host round-trip instead of two)
        self._spec_words: Dict[int, int] = {}

    def _const(self, kind, shape=(), fill=0):
        key = (kind, shape, fill)
        if key not in self._const_cache:
            if kind == "zeros_u16":
                v = jnp.zeros(shape, jnp.uint16)
            elif kind == "zeros_f32":
                v = jnp.zeros(shape, jnp.float32)
            elif kind == "full_u32":
                v = jnp.full(shape, fill, jnp.uint32)
            elif kind == "i32":
                v = jnp.int32(fill)
            else:
                raise KeyError(kind)
            self._const_cache[key] = v
        return self._const_cache[key]

    # ------------------------------------------------------------------
    def _clr_range(self, clr: int, minmax: Sequence[int]) -> Tuple[int, int]:
        """Symbol range per color, bucketed dynamic per image content.

        The reference fixes Y at [-127, 128] (LLICTI_nets.py:394-395) and
        restricts only Co/Cg; we restrict Y too (clamped to the reference
        range): CDF-table width and decode-scan cost scale with the
        range, and the restriction is lossless — the per-image min/max
        ride the header either way."""
        if clr == 0:
            lo, hi = bucket_range(int(minmax[0]) - 127,
                                  int(minmax[3]) - 127)
            return max(lo, -127), min(hi, 128)
        return bucket_range(int(minmax[clr]), int(minmax[3 + clr]))

    def _scale_shapes(self, S, last_h, last_w, pad_flags):
        """(scl, h, w) per scale in decode order, shape-derived only."""
        h, w = last_h, last_w
        shapes = [(S - 1, h, w)]
        for scl in range(S - 2, -1, -1):
            h = 2 * h - int(pad_flags[scl + 1][0])
            w = 2 * w - int(pad_flags[scl + 1][1])
            shapes.append((scl, h, w))
        return shapes

    def _words_cap(self, S, last_h, last_w, pad_flags,
                   min_scl: int = 0) -> int:
        """Worst-case stream words, derived from the image shape only.
        ``min_scl=1`` gives the two-stage HEAD prefix cap (decode order is
        coarse->fine, so scales >= 1 read only the first cap_head words)."""
        total = self.N
        for scl, h, w in self._scale_shapes(S, last_h, last_w, pad_flags):
            if scl < min_scl:
                continue
            padH, padW = pad_flags[scl]
            for b in range(3):
                ch, cw = band_coded_shape(h, w, b, padH, padW)
                for _clr in range(3):
                    bucket = max(64, -(-(ch * cw) // 4096) * 4096)
                    total += -(-bucket // self.N) * self.N
        return -(-total // 65536) * 65536

    def _header_group(self, S, last_h, last_w, orig_h, orig_w, minmax,
                      pad_int, raw) -> List[bytes]:
        header = (np.array([S], np.uint8).tobytes()
                  + np.array([last_h, last_w], np.uint16).tobytes()
                  + np.array([orig_h, orig_w], np.uint32).tobytes())
        return [header, np.array(minmax, np.int16).tobytes(),
                np.array([pad_int], np.int16).tobytes(), raw,
                b"", b"", b"", b"", b""]

    def _host_header(self, rgb: np.ndarray):
        """Host-side (minmax, raw-band) for the container header.

        Bit-exact twin of the device computation in ``front_fn`` (integer
        lifting + strided subsample) — removes the per-image device sync
        the encoder used to pay for fetching them (one tunnel RTT; the
        encode path then has a SINGLE host sync, the finalize fetch)."""
        ycocg = rgb_int_to_ycocg_r_int_np(rgb[0])
        minmax = [int(ycocg[..., c].min()) for c in range(3)] + \
                 [int(ycocg[..., c].max()) for c in range(3)]
        stride = 2 ** (max(self.cfg.dwtlevels) + 1)
        raw = np.ascontiguousarray(rgb[:, ::stride, ::stride, :])
        return minmax, raw.astype(np.uint8)

    def _prepare(self, rgb: np.ndarray):
        """[H,W,3]/[1,H,W,3] uint8 -> (padded [1,H',W',3], orig_h, orig_w).

        With size_bucket set, replicate-pads to bucket multiples so a
        ragged eval set hits a bounded set of compiled shapes."""
        if rgb.ndim == 3:
            rgb = rgb[None]
        assert rgb.shape[0] == 1 and rgb.shape[-1] == 3
        orig_h, orig_w = rgb.shape[1], rgb.shape[2]
        if self.size_bucket:
            B = self.size_bucket
            H = -(-orig_h // B) * B
            W = -(-orig_w // B) * B
            rgb = np.pad(rgb, ((0, 0), (0, H - orig_h), (0, W - orig_w),
                               (0, 0)), mode="edge")
        self.compiled_shapes.add((rgb.shape[1], rgb.shape[2]))
        return rgb, orig_h, orig_w

    # ------------------------------------------------------------------
    def compress(self, rgb: np.ndarray) -> List[List[bytes]]:
        """Encode one image. rgb: [H, W, 3] or [1, H, W, 3] uint8."""
        cfg = self.cfg
        rgb, orig_h, orig_w = self._prepare(rgb)
        H, W = rgb.shape[1], rgb.shape[2]
        pad_flags, pad_int = pad_flags_for_shape(H, W, cfg.dwtlevels)
        S = cfg.num_scales

        y_list, _mm, x00_raw = self._front(jnp.asarray(rgb.astype(np.uint8)),
                                           cfg.dwtlevels)
        # header derived on HOST (bit-exact integer twin) — no device sync
        minmax, raw_np = self._host_header(rgb)
        last_h, last_w = y_list[S - 1].shape[1], y_list[S - 1].shape[2]
        raw = raw_np.tobytes()
        streams: List[List[bytes]] = [
            self._header_group(S, last_h, last_w, orig_h, orig_w, minmax,
                               pad_int, raw)]

        if self.backend == "device":
            return self._compress_device(streams, y_list, x00_raw, minmax,
                                         pad_flags)
        return self._compress_host(streams, y_list, minmax, pad_flags)

    # ---- device backend ------------------------------------------------
    def _slices(self, y_lev, scl, pad_flags, minmax):
        """Yield (b, clr, minv, maxv, ch, cw, pmap) in decode order for one
        scale.  pmap is computed once per band (shared program)."""
        padH, padW = pad_flags[scl]
        h, w = y_lev.shape[1], y_lev.shape[2]
        for b in range(3):
            pmap = self._band_params(self.params, y_lev, scl, b)
            ch, cw = band_coded_shape(h, w, b, padH, padW)
            for clr in range(3):
                minv, maxv = self._clr_range(clr, minmax)
                yield (b, clr, minv, maxv, ch, cw, pmap)

    def _ranges(self, minmax):
        return tuple(self._clr_range(clr, minmax) for clr in range(3))

    def _pts3(self, ranges):
        """Cached device-resident sampling grids, one per color.

        Passed as runtime operands: a constant-folded grid becomes a
        program literal whose per-grid-step DMA into the Pallas kernel
        is ~400x slower (measured; see _cdf_cum)."""
        out = []
        for minv, maxv in ranges:
            key = ("pts", minv, maxv)
            if key not in self._const_cache:
                self._const_cache[key] = jax.device_put(
                    cdf_sampling_points(minv, maxv))
            out.append(self._const_cache[key])
        return tuple(out)

    def _pad_flags_t(self, pad_flags):
        return tuple((bool(a), bool(b)) for a, b in pad_flags)

    def _encode_dispatch(self, y_list, x00_raw, minmax, pad_flags):
        """Enqueue a K-image encode (ONE fused program); returns device
        handles only (no host sync), so several dispatches can be
        pipelined.  cursors [K, 45] (encode order), states [K, N],
        buf [K, cap]."""
        cfg = self.cfg
        S = cfg.num_scales
        K = x00_raw.shape[0]
        ranges = self._ranges(minmax)
        last_h = y_list[S - 1].shape[1]
        last_w = y_list[S - 1].shape[2]
        cap = self._words_cap(S, last_h, last_w, pad_flags)
        # dummies matching the decoder's shapes: the fused program is the
        # *same executable* for both directions (enable=0 skips the scans);
        # cached read-only buffers, so no per-image creation dispatches
        dummy_words = self._const("zeros_u16", (K, cap))
        dummy_states = self._const("full_u32", (K, self.N), rd.RANS_L)
        zero = self._const("i32", fill=0)
        pts3 = self._pts3(ranges)
        pf_t = self._pad_flags_t(pad_flags)
        if self.two_stage:
            # same head/tail executables the decoder runs (CDF invariant)
            cap_h = self._words_cap(S, last_h, last_w, pad_flags, min_scl=1)
            dummy_head = self._const("zeros_u16", (K, cap_h))
            y1, st_h, off_h, sf_head = self._head_fn(
                self.params, x00_raw, tuple(y_list[1:]), dummy_head,
                dummy_states, zero, pts3, pf_t, ranges, self.N)
            _y, _rgb, buf, cursors, states, ideal = self._tail_fn(
                self.params, y1, y_list[0], dummy_words, st_h, off_h,
                zero, sf_head, pts3, pf_t, ranges, self.N)
        else:
            _y, _rgb, buf, cursors, states, ideal = self._image_fn(
                self.params, x00_raw, tuple(y_list), dummy_words,
                dummy_states, zero, pts3, pf_t, ranges, self.N)
        slice_meta = [(scl, b, clr) for scl in range(S - 1, -1, -1)
                      for b in range(3) for clr in range(3)]
        return slice_meta, cursors, states, buf, ideal

    def _slice_bits_table(self, slice_meta, cursors_row) -> List[List[int]]:
        """Per-slice word-count cursors (encode order) -> a
        [scale][b*3+clr] bits table in decode order (one image)."""
        S = self.cfg.num_scales
        counts = np.diff(np.concatenate([[0], cursors_row])).astype(int)
        counts_decode_order = list(reversed([int(c) for c in counts]))
        bits: Dict[Tuple[int, int, int], int] = {}
        for (scl, b, clr), c in zip(slice_meta, counts_decode_order):
            bits[(scl, b, clr)] = c * 16
        return [
            [bits[(scl, b, clr)] for b in range(3) for clr in range(3)]
            for scl in range(S - 1, -1, -1)
        ]

    def _encode_finalize(self, streams, slice_meta, cursors_np, states_np,
                         packed_np):
        """Single-image (K=1) finalize: cursors_np [1,45] etc."""
        cursors_np = np.asarray(cursors_np)[0]
        total = int(cursors_np[-1])
        blob = rd.pack_stream_packed(np.asarray(packed_np)[0][:total],
                                     np.asarray(states_np)[0])
        streams.append([blob])
        self.last_slice_bits = self._slice_bits_table(slice_meta, cursors_np)
        # head split point (exact words the coarse scales S-1..1 consume):
        # lets a two-stage decoder upload only the stream head before
        # dispatching stage 1 (rows are decode order, coarsest first)
        head_words = sum(sum(row) for row in self.last_slice_bits[:-1]) // 16
        streams[0][0] = (streams[0][0][:13]
                         + np.array([head_words], np.uint32).tobytes())
        return streams

    def _ideal_bits_table(self, ideal_row) -> List[List[float]]:
        """[n_slices] decode-order ideal bits -> [scale][b*3+clr] table
        (row 0 = coarsest scale, matching last_slice_bits)."""
        S = self.cfg.num_scales
        vals = [float(v) for v in ideal_row]
        return [
            [vals[s * 9 + b * 3 + clr] for b in range(3) for clr in range(3)]
            for s in range(S)]

    def _compress_device(self, streams, y_list, x00_raw, minmax, pad_flags):
        slice_meta, cursors, states, buf, ideal = self._encode_dispatch(
            y_list, x00_raw, minmax, pad_flags)
        # speculative one-sync finalize: fetch a payload prefix sized by
        # the last image of this shape family together with the cursors;
        # top up only on under-guess (rare: +12.5% headroom)
        cap = buf.shape[1]
        guess = self._spec_words.get(cap, 0)
        if guess:
            bucket_g = min(cap, -(-guess // 65536) * 65536)
            cursors_np, states_np, ideal_np, packed = jax.device_get(
                (cursors, states, ideal, buf[:, :bucket_g]))
            total = int(cursors_np[0, -1])
            if total > packed.shape[1]:
                bucket = min(cap, -(-total // 65536) * 65536)
                rest = np.asarray(jax.device_get(
                    buf[:, packed.shape[1]:bucket]))
                packed = np.concatenate([np.asarray(packed), rest], axis=1)
        else:
            cursors_np, states_np, ideal_np = jax.device_get(
                (cursors, states, ideal))
            total = int(cursors_np[0, -1])
            bucket = min(cap, -(-max(1, total) // 65536) * 65536)
            packed = np.asarray(jax.device_get(buf[:, :bucket]))
        self._spec_words[cap] = total + total // 8
        self.last_ideal_bits = self._ideal_bits_table(
            np.asarray(ideal_np)[0])
        return self._encode_finalize(streams, slice_meta, cursors_np,
                                     states_np, packed)

    def compress_many(self, imgs) -> List[List[List[bytes]]]:
        """Pipelined encode of several images (device backend): all front
        transforms dispatch first (uploads overlap), then all slice/chain
        programs, with one host sync per stage instead of three per image.

        Accounting matches :meth:`compress_batch`: ``last_slice_bits_batch``
        / ``last_ideal_bits_batch`` hold one [scale][b*3+clr] table per
        image; ``last_slice_bits`` / ``last_ideal_bits`` are the
        elementwise sums over the call."""
        cfg = self.cfg
        S = cfg.num_scales
        stage1 = []
        for rgb in imgs:
            rgb, orig_h, orig_w = self._prepare(rgb)
            H, W = rgb.shape[1], rgb.shape[2]
            pad_flags, pad_int = pad_flags_for_shape(H, W, cfg.dwtlevels)
            y_list, _mm, x00_raw = self._front(
                jnp.asarray(rgb.astype(np.uint8)), cfg.dwtlevels)
            # host-derived header (no sync): the upload of image i+1 and
            # the slice programs of image i overlap with this host work
            minmax, raw_np = self._host_header(rgb)
            stage1.append((y_list, minmax, raw_np, x00_raw, pad_flags,
                           pad_int, orig_h, orig_w))
        stage2 = []
        for (y_list, minmax, raw_np, x00_raw, pad_flags, pad_int,
             orig_h, orig_w) in stage1:
            last_h = y_list[S - 1].shape[1]
            last_w = y_list[S - 1].shape[2]
            streams = [self._header_group(S, last_h, last_w, orig_h, orig_w,
                                          minmax, pad_int, raw_np.tobytes())]
            meta, cursors, states, buf, ideal = self._encode_dispatch(
                y_list, x00_raw, minmax, pad_flags)
            stage2.append((streams, meta, cursors, states, buf, ideal))
        # one-sync finalize: cursors + states + ideal + a speculative
        # payload prefix for every image in a single device_get; only
        # under-guessed images pay a second fetch
        reqs = []
        for (_st, _m, cursors, states, buf, ideal) in stage2:
            cap = buf.shape[1]
            guess = self._spec_words.get(cap, 0)
            bucket_g = min(cap, -(-max(guess, 65536) // 65536) * 65536)
            reqs.append((cursors, states, ideal, buf[:, :bucket_g]))
        got = jax.device_get(reqs)
        out = []
        # per-image accounting (same contract as compress_batch): the
        # *_batch tables carry one [scale][b*3+clr] table per image, and
        # last_slice_bits/last_ideal_bits are the elementwise sums — so
        # the est/act + coder-closure gates describe EVERY image of a
        # pipelined call, not just the last one
        per_act: List[List[List[int]]] = []
        per_ideal: List[List[List[float]]] = []
        for (streams, meta, _c, _s, buf, _i), (
                cursors_np, states_np, ideal_np, packed) in zip(stage2, got):
            total = int(np.asarray(cursors_np)[0, -1])
            cap = buf.shape[1]
            if total > packed.shape[1]:
                bucket = min(cap, -(-total // 65536) * 65536)
                rest = np.asarray(jax.device_get(
                    buf[:, packed.shape[1]:bucket]))
                packed = np.concatenate([np.asarray(packed), rest], axis=1)
            self._spec_words[cap] = total + total // 8
            out.append(self._encode_finalize(streams, meta, cursors_np,
                                             states_np, packed))
            per_act.append(self.last_slice_bits)
            per_ideal.append(self._ideal_bits_table(np.asarray(ideal_np)[0]))
        self.last_slice_bits_batch = per_act
        self.last_ideal_bits_batch = per_ideal
        self.last_slice_bits = [
            [sum(t[s][i] for t in per_act) for i in range(9)]
            for s in range(len(per_act[0]))]
        self.last_ideal_bits = [
            [sum(t[s][i] for t in per_ideal) for i in range(9)]
            for s in range(len(per_ideal[0]))]
        return out

    def _decode_host_prep(self, streams, S, minmax, pad_flags, raw):
        """Host-only stage of a device-backend decode: stream unpack +
        pad to the upload bucket.  No device traffic."""
        blob = streams[1][0]
        states_np, words_np = rd.unpack_stream(blob, self.N)
        # upload the (small, bucketed) stream as uint16, then pad on device
        # to the shape-derived worst-case buffer so decode program shapes
        # never depend on the compressed size
        up = -(-max(1, words_np.size) // 16384) * 16384
        w_pad = np.pad(words_np.astype(np.uint16),
                       (0, up - words_np.size))[None]
        return dict(S=S, minmax=minmax, pad_flags=pad_flags, raw=raw,
                    states=states_np[None], w_pad=w_pad,
                    head_words=getattr(self, "_head_words", 0))

    def _decode_ydirect(self, S, raw, pad_flags):
        c4 = 4 * self.cfg.cond_channels
        shapes = dict((scl, (h, w)) for scl, h, w in
                      self._scale_shapes(S, raw.shape[1], raw.shape[2],
                                         pad_flags))
        return tuple(
            self._const("zeros_f32", (1,) + shapes[scl] + (c4,))
            for scl in range(S))

    def _two_stage_decode(self, S, raw, pad_flags, ranges, words_head,
                          words_full, states, raw_dev):
        """Head dispatch on the stream prefix, tail on the full buffer
        (single image; the batch path branches in _batch_launch)."""
        pts3 = self._pts3(ranges)
        pf_t = self._pad_flags_t(pad_flags)
        one = self._const("i32", fill=1)
        y_direct = self._decode_ydirect(S, raw, pad_flags)
        y1, st_h, off_h, sf_head = self._head_fn(
            self.params, raw_dev, y_direct[1:], words_head, states, one,
            pts3, pf_t, ranges, self.N)
        y_lev, rgb, _b, _c, _e, _i = self._tail_fn(
            self.params, y1, y_direct[0], words_full, st_h, off_h, one,
            sf_head, pts3, pf_t, ranges, self.N)
        self._last_y_lev = (y_lev, int(pad_flags[0][0]),
                            int(pad_flags[0][1]))
        return rgb

    def _decode_launch(self, p, w_small, states, raw_dev):
        """Dispatch the decode program(s) on uploaded buffers."""
        S, pad_flags, raw = p["S"], p["pad_flags"], p["raw"]
        ranges = self._ranges(p["minmax"])
        cap = self._words_cap(S, raw.shape[1], raw.shape[2], pad_flags)
        words = self._pad_words(w_small, cap)
        if self.two_stage:
            cap_h = self._words_cap(S, raw.shape[1], raw.shape[2],
                                    pad_flags, min_scl=1)
            return self._two_stage_decode(
                S, raw, pad_flags, ranges,
                self._slice_words(words, cap_h), words, states, raw_dev)
        one = self._const("i32", fill=1)
        y_direct = self._decode_ydirect(S, raw, pad_flags)
        y_lev, rgb, _buf, _curs, _est, _ideal = self._image_fn(
            self.params, raw_dev, y_direct, words, states, one,
            self._pts3(ranges), self._pad_flags_t(pad_flags), ranges,
            self.N)
        self._last_y_lev = (y_lev, int(pad_flags[0][0]),
                            int(pad_flags[0][1]))
        return rgb

    def _decompress_device(self, streams, S, minmax, pad_flags, raw):
        p = self._decode_host_prep(streams, S, minmax, pad_flags, raw)
        if self.two_stage and p["head_words"] > 0:
            # split upload: dispatch the head on the stream PREFIX, then
            # upload the tail while the coarse scales compute (all calls
            # below are async; the one sync is the caller's rgb fetch)
            hw = p["head_words"]
            w_np = p["w_pad"]
            uh = min(w_np.shape[1], -(-max(1, hw) // 16384) * 16384)
            head_small = jnp.asarray(w_np[:, :uh])
            states_dev = jnp.asarray(p["states"], jnp.uint32)
            raw_dev = jnp.asarray(raw)
            ranges = self._ranges(minmax)
            cap = self._words_cap(S, raw.shape[1], raw.shape[2], pad_flags)
            cap_h = self._words_cap(S, raw.shape[1], raw.shape[2],
                                    pad_flags, min_scl=1)
            words_head = self._pad_words(head_small, cap_h)
            pts3 = self._pts3(ranges)
            pf_t = self._pad_flags_t(pad_flags)
            one = self._const("i32", fill=1)
            y_direct = self._decode_ydirect(S, raw, pad_flags)
            # head dispatched BEFORE the tail upload is enqueued, so the
            # coarse scales compute while the stream bulk is in flight
            y1, st_h, off_h, sf_head = self._head_fn(
                self.params, raw_dev, y_direct[1:], words_head, states_dev,
                one, pts3, pf_t, ranges, self.N)
            tail_small = jnp.asarray(w_np[:, uh:])
            words_full = self._concat_pad(head_small, tail_small, cap)
            y_lev, rgb, _b, _c, _e, _i = self._tail_fn(
                self.params, y1, y_direct[0], words_full, st_h, off_h, one,
                sf_head, pts3, pf_t, ranges, self.N)
            self._last_y_lev = (y_lev, int(pad_flags[0][0]),
                                int(pad_flags[0][1]))
            return rgb
        return self._decode_launch(
            p, jnp.asarray(p["w_pad"]),
            jnp.asarray(p["states"], jnp.uint32), jnp.asarray(raw))

    # ---- host backend --------------------------------------------------
    def _compress_host(self, streams, y_list, minmax, pad_flags):
        cfg = self.cfg
        S = cfg.num_scales
        jobs = {}
        order = []
        for scl in range(S - 1, -1, -1):
            y_lev = y_list[scl]
            payload = []
            for (b, clr, minv, maxv, ch, cw, pmap
                 ) in self._slices(y_lev, scl, pad_flags, minmax):
                cdfu = self._cdf_u16(pmap, y_lev, self._pts3(((minv, maxv),))[0], b, clr)
                lo, hi = self._gather_lohi(cdfu, y_lev, b, clr, ch, cw, minv)
                payload.append((lo, hi))
            lohis = jax.device_get(payload)
            for idx, (lo, hi) in enumerate(lohis):
                jobs[(scl, idx)] = self.pool.submit(
                    coder.encode_lohi, np.asarray(lo), np.asarray(hi))
            order.append(scl)
        for scl in order:
            streams.append([jobs[(scl, i)].result() for i in range(9)])
        self.last_slice_bits = [
            [len(s) * 8 for s in group] for group in streams[1:]
        ]
        return streams

    def _decompress_host(self, streams, S, minmax, pad_flags, raw):
        y_lev = self._init_scale(jnp.asarray(raw))
        for scl in range(S - 1, -1, -1):
            if scl != S - 1:
                y_lev = self._next_scale(y_lev, int(pad_flags[scl + 1][0]),
                                         int(pad_flags[scl + 1][1]))
            padH, padW = pad_flags[scl]
            h, w = y_lev.shape[1], y_lev.shape[2]
            sc_streams = streams[1 + (S - 1 - scl)]
            for b in range(3):
                pmap = self._band_params(self.params, y_lev, scl, b)
                ch, cw = band_coded_shape(h, w, b, padH, padW)
                for clr in range(3):
                    minv, maxv = self._clr_range(clr, minmax)
                    cdfu = self._cdf_u16(pmap, y_lev, self._pts3(((minv, maxv),))[0], b, clr)
                    cdf_host = np.asarray(
                        jax.device_get(cdfu[:, :ch, :cw]))
                    syms = coder.decode_cdf(
                        cdf_host.reshape(-1, cdf_host.shape[-1]),
                        sc_streams[b * 3 + clr])
                    syms = jnp.asarray(syms.astype(np.int32))
                    y_lev = self._writeback(y_lev, b, clr, padH, padW,
                                            ch, cw, syms, minv)
        self._last_y_lev = (y_lev, int(pad_flags[0][0]),
                            int(pad_flags[0][1]))
        out = self._postprocess(y_lev, int(pad_flags[0][0]),
                                int(pad_flags[0][1]))
        return np.asarray(jax.device_get(out))

    # ------------------------------------------------------------------
    def decompress_dispatch(self, streams: List[List[bytes]]):
        """Enqueue one image's decode; returns (on-device uint8 array,
        orig_h, orig_w).

        Dispatches are async, so several images' decodes can be enqueued
        back-to-back and fetched together — uploads, device compute, and
        read-backs of different images overlap (pipelined serving path).
        Host-backend streams fall back to the synchronous path.
        """
        S, minmax, pad_flags, raw, orig_h, orig_w = self._parse_container(
            streams)
        if len(streams) == 2 and len(streams[1]) == 1:
            out = self._decompress_device(streams, S, minmax, pad_flags, raw)
        else:
            out = self._decompress_host(streams, S, minmax, pad_flags, raw)
        return out, orig_h, orig_w

    def decompress(self, streams: List[List[bytes]],
                   xorg: Optional[np.ndarray] = None) -> np.ndarray:
        """Decode a bitstream list back to [1, H, W, 3] uint8 RGB.

        xorg: optional original RGB; when given, also verifies the
        decoded YCoCg tensor BEFORE the inverse color transform against
        the transform of the original (reference decompres(..., xorg),
        LLICTI_nets.py:168-171) and records ``last_ycocg_err``.
        """
        out, orig_h, orig_w = self.decompress_dispatch(streams)
        out = np.asarray(jax.device_get(out))
        if xorg is not None:
            y_lev, crop_h, crop_w = self._last_y_lev
            if xorg.ndim == 3:
                xorg = xorg[None]
            H = y_lev.shape[1] * 2 - crop_h
            W = y_lev.shape[2] * 2 - crop_w
            xpad = np.pad(
                xorg,
                ((0, 0), (0, H - xorg.shape[1]), (0, W - xorg.shape[2]),
                 (0, 0)), mode="edge")
            self.last_ycocg_err = int(self._ycocg_err(
                y_lev, jnp.asarray(xpad.astype(np.uint8)), crop_h, crop_w))
        return out[:, :orig_h, :orig_w, :]

    def _parse_container(self, streams):
        """Header parse shared by the single and pipelined decode paths."""
        hdr = streams[0][0]
        S = int(np.frombuffer(hdr[:1], np.uint8)[0])
        assert S == self.cfg.num_scales
        last_h, last_w = (int(v) for v in np.frombuffer(hdr[1:5], np.uint16))
        orig_h, orig_w = (int(v) for v in np.frombuffer(hdr[5:13], np.uint32))
        # head split point (two-stage decode); 0 on pre-split containers
        self._head_words = (int(np.frombuffer(hdr[13:17], np.uint32)[0])
                            if len(hdr) >= 17 else 0)
        minmax = [int(v) for v in np.frombuffer(streams[0][1], np.int16)]
        pad_int = int(np.frombuffer(streams[0][2], np.int16)[0])
        pad_flags = unpack_pad_flags(pad_int, S)
        raw = np.frombuffer(streams[0][3], np.uint8).reshape(
            1, last_h, last_w, 3)
        return S, minmax, pad_flags, raw, orig_h, orig_w

    def decompress_many(self, streams_list) -> List[np.ndarray]:
        """Pipelined decode of several images: all host unpacks first,
        then all uploads in one device_put, then all dispatches, one
        sync — transfers of image i+1 overlap device compute of image i
        without any host-stage interleaving stalls."""
        if any(not (len(s) == 2 and len(s[1]) == 1) for s in streams_list):
            # host-backend containers: synchronous fallback
            outs = [self.decompress_dispatch(s) for s in streams_list]
            fetched = jax.device_get([o[0] for o in outs])
            return [np.asarray(f)[:, :oh, :ow, :]
                    for f, (_d, oh, ow) in zip(fetched, outs)]
        preps = []
        for streams in streams_list:
            S, minmax, pad_flags, raw, oh, ow = self._parse_container(streams)
            p = self._decode_host_prep(streams, S, minmax, pad_flags, raw)
            p["orig"] = (oh, ow)
            preps.append(p)
        uploads = jax.device_put([
            (p["w_pad"], p["states"].astype(np.uint32), p["raw"])
            for p in preps])
        outs = []
        for p, (w_small, states, raw_dev) in zip(preps, uploads):
            outs.append(self._decode_launch(p, w_small, states, raw_dev))
        fetched = jax.device_get(outs)
        return [np.asarray(f)[:, :p["orig"][0], :p["orig"][1], :]
                for f, p in zip(fetched, preps)]

    # ---- resident (serving steady-state) paths -------------------------
    # In production the bitstream arrives in host RAM over a real NIC and
    # host<->HBM runs at PCIe rates; on this dev harness the TPU sits
    # behind a tunnel with multi-minute 7-180 MB/s bandwidth phases, so
    # e2e numbers measure the tunnel as much as the chip.  These helpers
    # stage one container's inputs in HBM once and return zero-upload
    # dispatch closures — the sustained per-dispatch time is the chip's
    # decode/encode throughput (dispatch RPC overhead included, transfers
    # excluded), which is what a serving deployment sees.

    def prepare_decode(self, streams):
        """Stage a container in HBM; returns fn() -> device rgb handle.

        Everything shape-derived (worst-case stream pad, sampling grids,
        scale shapes) is hoisted out of the closure, so each call is ONE
        program dispatch on resident buffers."""
        S, minmax, pad_flags, raw, _oh, _ow = self._parse_container(streams)
        p = self._decode_host_prep(streams, S, minmax, pad_flags, raw)
        w_small, states, raw_dev = jax.block_until_ready(jax.device_put(
            (p["w_pad"], p["states"].astype(np.uint32), p["raw"])))
        ranges = self._ranges(minmax)
        cap = self._words_cap(S, raw.shape[1], raw.shape[2], pad_flags)
        words = jax.block_until_ready(self._pad_words(w_small, cap))
        one = self._const("i32", fill=1)
        c4 = 4 * self.cfg.cond_channels
        shapes = dict((scl, (h, w)) for scl, h, w in
                      self._scale_shapes(S, raw.shape[1], raw.shape[2],
                                         pad_flags))
        y_direct = tuple(
            self._const("zeros_f32", (1,) + shapes[scl] + (c4,))
            for scl in range(S))
        pts3 = self._pts3(ranges)
        pf_t = self._pad_flags_t(pad_flags)
        if self.two_stage:
            cap_h = self._words_cap(S, raw.shape[1], raw.shape[2],
                                    pad_flags, min_scl=1)
            words_head = jax.block_until_ready(
                self._slice_words(words, cap_h))

            def dispatch():
                y1, st_h, off_h, sf_head = self._head_fn(
                    self.params, raw_dev, y_direct[1:], words_head, states,
                    one, pts3, pf_t, ranges, self.N)
                _y, rgb, _b, _c, _s, _i = self._tail_fn(
                    self.params, y1, y_direct[0], words, st_h, off_h, one,
                    sf_head, pts3, pf_t, ranges, self.N)
                return rgb

            return dispatch

        def dispatch():
            _y, rgb, _b, _c, _s, _i = self._image_fn(
                self.params, raw_dev, y_direct, words, states, one,
                pts3, pf_t, ranges, self.N)
            return rgb

        return dispatch

    def prepare_encode(self, rgb: np.ndarray):
        """Stage an image in HBM; returns fn() -> (cursors, states, buf,
        ideal) device handles (host finalize excluded — the payload stays
        in HBM, as when a downstream device consumer or collective takes
        it)."""
        cfg = self.cfg
        rgb, _oh, _ow = self._prepare(rgb)
        H, W = rgb.shape[1], rgb.shape[2]
        pad_flags, _pad_int = pad_flags_for_shape(H, W, cfg.dwtlevels)
        rgb_dev = jax.device_put(rgb.astype(np.uint8))
        minmax, _raw = self._host_header(rgb)

        def dispatch():
            y_list, _mm, x00_raw = self._front(rgb_dev, cfg.dwtlevels)
            _meta, cursors, states, buf, ideal = self._encode_dispatch(
                y_list, x00_raw, minmax, pad_flags)
            return cursors, states, buf, ideal

        return dispatch

    # ---- batch container (K images, ONE fused program) -----------------
    # A batch is a first-class coding unit: the K same-shape images are
    # encoded by one K-batched executable (convs get a real batch
    # dimension for MXU utilization; each image keeps its own independent
    # rANS lanes/stream) and MUST be decoded by the same K-batched
    # executable — that shared-program pairing is what guarantees
    # bit-identical CDFs, exactly like the single-image enable-flag
    # design.  CDF symbol ranges are the union over the batch (stored
    # once in the container header; slightly wider than per-image
    # dynamic ranges).  Serving analog: a shard of same-size tiles.

    def compress_batch(self, imgs: Sequence[np.ndarray]) -> List[List[bytes]]:
        """Encode K same-shape uint8 images into one batch container."""
        cfg = self.cfg
        S = cfg.num_scales
        assert self.backend == "device"
        prepped = [self._prepare(rgb) for rgb in imgs]
        arrs = [p[0] for p in prepped]
        assert len({a.shape for a in arrs}) == 1, "batch requires one shape"
        K = len(arrs)
        assert K < 255
        batch = np.concatenate(arrs, axis=0).astype(np.uint8)
        H, W = batch.shape[1], batch.shape[2]
        pad_flags, pad_int = pad_flags_for_shape(H, W, cfg.dwtlevels)
        y_list, _mm, x00_raw = self._front(jnp.asarray(batch), cfg.dwtlevels)
        # union minmax + raw band on HOST (bit-exact twin; no device sync)
        ycocg = rgb_int_to_ycocg_r_int_np(batch)
        minmax = [int(ycocg[..., c].min()) for c in range(3)] + \
                 [int(ycocg[..., c].max()) for c in range(3)]
        stride = 2 ** (max(cfg.dwtlevels) + 1)
        x00_np = np.ascontiguousarray(
            batch[:, ::stride, ::stride, :]).astype(np.uint8)
        last_h = y_list[S - 1].shape[1]
        last_w = y_list[S - 1].shape[2]
        origs = np.array([[p[1], p[2]] for p in prepped], np.uint32)
        hdr = (np.array([255, K, S], np.uint8).tobytes()
               + np.array([last_h, last_w], np.uint16).tobytes()
               + origs.tobytes())
        streams: List[List[bytes]] = [[
            hdr, np.array(minmax, np.int16).tobytes(),
            np.array([pad_int], np.int16).tobytes(),
            np.asarray(x00_np).tobytes(), b"", b"", b"", b"", b""]]
        meta, cursors, states, buf, ideal = self._encode_dispatch(
            y_list, x00_raw, minmax, pad_flags)
        cursors_np, states_np, ideal_np = jax.device_get(
            (cursors, states, ideal))
        self.last_ideal_bits_batch = [
            self._ideal_bits_table(np.asarray(ideal_np)[k])
            for k in range(K)]
        self.last_ideal_bits = [
            [sum(t[s][i] for t in self.last_ideal_bits_batch)
             for i in range(9)]
            for s in range(len(self.last_ideal_bits_batch[0]))
        ]
        total_max = int(np.asarray(cursors_np)[:, -1].max())
        bucket = min(buf.shape[1], -(-max(1, total_max) // 65536) * 65536)
        packed = np.asarray(jax.device_get(buf[:, :bucket]))
        for k in range(K):
            blob = rd.pack_stream_packed(
                packed[k][: int(cursors_np[k, -1])], states_np[k])
            streams.append([blob])
        # per-image slice accounting (cursors are per-image already);
        # last_slice_bits = the K tables summed elementwise, so the
        # est/act cross-check works on batch containers too
        per_img = [self._slice_bits_table(meta, np.asarray(cursors_np)[k])
                   for k in range(K)]
        self.last_slice_bits_batch = per_img
        self.last_slice_bits = [
            [sum(t[s][i] for t in per_img) for i in range(9)]
            for s in range(len(per_img[0]))
        ]
        return streams

    def _batch_stage(self, streams):
        """Parse + host-unpack a batch container; upload its buffers."""
        cfg = self.cfg
        hdr = streams[0][0]
        marker, K, S = (int(v) for v in np.frombuffer(hdr[:3], np.uint8))
        assert marker == 255 and S == cfg.num_scales
        last_h, last_w = (int(v) for v in np.frombuffer(hdr[3:7], np.uint16))
        origs = np.frombuffer(hdr[7:7 + 8 * K], np.uint32).reshape(K, 2)
        minmax = [int(v) for v in np.frombuffer(streams[0][1], np.int16)]
        pad_int = int(np.frombuffer(streams[0][2], np.int16)[0])
        pad_flags = unpack_pad_flags(pad_int, S)
        raw = np.frombuffer(streams[0][3], np.uint8).reshape(
            K, last_h, last_w, 3)
        sts, wds = zip(*(rd.unpack_stream(streams[1 + k][0], self.N)
                         for k in range(K)))
        max_w = max(max(w.size for w in wds), 1)
        up = -(-max_w // 16384) * 16384
        w_np = np.stack(
            [np.pad(w.astype(np.uint16), (0, up - w.size)) for w in wds])
        w_small, states, raw_dev = jax.device_put(
            (w_np, np.stack(sts).astype(np.uint32), raw))
        return dict(K=K, S=S, last_h=last_h, last_w=last_w, origs=origs,
                    minmax=minmax, pad_flags=pad_flags), \
            w_small, states, raw_dev

    def _batch_launch(self, m, w_small, states, raw_dev):
        cfg = self.cfg
        K, S = m["K"], m["S"]
        pad_flags = m["pad_flags"]
        ranges = self._ranges(m["minmax"])
        cap = self._words_cap(S, m["last_h"], m["last_w"], pad_flags)
        words = self._pad_words(w_small, cap)
        one = self._const("i32", fill=1)
        c4 = 4 * cfg.cond_channels
        shapes = dict((scl, (h, w)) for scl, h, w in
                      self._scale_shapes(S, m["last_h"], m["last_w"],
                                         pad_flags))
        y_direct = tuple(
            self._const("zeros_f32", (K,) + shapes[scl] + (c4,))
            for scl in range(S))
        pts3 = self._pts3(ranges)
        pf_t = self._pad_flags_t(pad_flags)
        if self.two_stage:
            cap_h = self._words_cap(S, m["last_h"], m["last_w"], pad_flags,
                                    min_scl=1)
            y1, st_h, off_h, sf_head = self._head_fn(
                self.params, raw_dev, y_direct[1:],
                self._slice_words(words, cap_h), states, one, pts3, pf_t,
                ranges, self.N)
            y_lev, rgb, _b, _c, _e, _i = self._tail_fn(
                self.params, y1, y_direct[0], words, st_h, off_h, one,
                sf_head, pts3, pf_t, ranges, self.N)
        else:
            y_lev, rgb, _buf, _curs, _est, _ideal = self._image_fn(
                self.params, raw_dev, y_direct, words, states, one,
                pts3, pf_t, ranges, self.N)
        self._last_y_lev = (y_lev, int(pad_flags[0][0]),
                            int(pad_flags[0][1]))
        return rgb

    def decompress_batch(self, streams: List[List[bytes]]
                         ) -> List[np.ndarray]:
        """Decode a batch container -> list of K [H, W, 3] uint8 images."""
        m, w_small, states, raw_dev = self._batch_stage(streams)
        rgb = self._batch_launch(m, w_small, states, raw_dev)
        out = np.asarray(jax.device_get(rgb))
        origs = m["origs"]
        return [out[k, : int(origs[k, 0]), : int(origs[k, 1])]
                for k in range(m["K"])]

    def prepare_decode_batch(self, streams):
        """Stage a batch container in HBM; returns fn() -> device rgb
        handle [K, H, W, 3] (resident serving path, like
        :meth:`prepare_decode` but for the K-batched executable)."""
        m, w_small, states, raw_dev = self._batch_stage(streams)
        jax.block_until_ready(raw_dev)

        def dispatch():
            return self._batch_launch(m, w_small, states, raw_dev)

        return dispatch

    # ------------------------------------------------------------------
    @staticmethod
    def serialize(streams: List[List[bytes]]) -> bytes:
        """Flatten the nested stream list into one length-prefixed blob."""
        out = [np.array([len(streams)], np.uint32).tobytes()]
        for group in streams:
            out.append(np.array([len(group)], np.uint32).tobytes())
            for s in group:
                out.append(np.array([len(s)], np.uint32).tobytes())
                out.append(s)
        return b"".join(out)

    @staticmethod
    def deserialize(blob: bytes) -> List[List[bytes]]:
        off = 0

        def u32():
            nonlocal off
            v = int(np.frombuffer(blob[off:off + 4], np.uint32)[0])
            off += 4
            return v

        n_groups = u32()
        streams = []
        for _ in range(n_groups):
            n = u32()
            group = []
            for _ in range(n):
                ln = u32()
                group.append(blob[off:off + ln])
                off += ln
            streams.append(group)
        return streams

    @staticmethod
    def num_bytes(streams: List[List[bytes]]) -> int:
        return sum(len(s) for g in streams for s in g)
