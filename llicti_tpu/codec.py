"""Lossless codec: compress/decompress orchestration.

TPU-native re-design of the reference's codec path
(graphs/models/LLICTI_nets.py:125-179, 344-509):

* All NN parameter maps and int16 CDF tables are produced by jitted
  functions that are **shared between the encoder and the decoder** at
  identical call granularity.  XLA:TPU is deterministic per compiled
  program, so encode and decode see bit-identical CDFs — the precondition
  for lossless round-trips (SURVEY.md §7 "hard parts").
* Integer<->float conversions are exact in f32 (|v| <= 511), and both
  sides use the same ``(int - shift) / 255`` expression.
* Encode-path host transfer is 2 uint16 per pixel: the TPU gathers
  cdf[s] and cdf[s+1] from the on-device table, instead of shipping the
  full ~0.5-1 KB/pixel table as the reference does.  All 9 streams of a
  scale (and all scales) are then range-coded in parallel on a host
  thread pool.
* Decode transfers the full per-pixel CDF table for each (scale, band,
  color) step (the auto-regressive write-back makes this unavoidable
  without approximation), then decodes on the host.

Dynamic Co/Cg ranges are bucketed (multiples of 32) so jit caches stay
small; the per-symbol cost of the extra near-zero-probability bins is
< 0.002 bits.

Bitstream layout (ours; structurally mirrors the reference's list of
lists, LLICTI_nets.py:344-354):
  streams[0] = [header, minmax_int16, pad_int16, raw_x00_rgb, b''*5]
  streams[1..S] = 9 streams for scales coarse -> fine, index b*3+clr.
"""
from __future__ import annotations

import concurrent.futures as futures
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import coder
from .config import ModelConfig
from .models.llicti import LLICTIModel
from .ops.color import rgb_int_to_ycocg_r_int, ycocg_r_int_to_rgb_int
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


def bucket_range(min_val: int, max_val: int) -> Tuple[int, int]:
    """Round a symbol range outward to RANGE_BUCKET multiples (jit-cache
    friendliness; the extra bins cost <0.002 bits/sym)."""
    lo = (min_val // RANGE_BUCKET) * RANGE_BUCKET
    hi = -((-(max_val + 1)) // RANGE_BUCKET) * RANGE_BUCKET - 1
    return int(lo), int(hi)


class Codec:
    """Encoder/decoder around a trained LLICTIModel.

    Only the reference's live codec configuration is supported
    (clrchs=3, clr_joint_mode=2, normal GMM — the reference's
    compress/decompress support exactly this subset too,
    LLICTI_nets.py:937-939).
    """

    def __init__(self, cfg: ModelConfig, params, num_threads: int = 8):
        assert cfg.clrchs == 3 and cfg.clr_joint_mode == 2, (
            "codec path requires clrchs=3, clr_joint_mode=2 (as reference)")
        assert cfg.distribution == "normal" and cfg.num_mixtures > 1
        assert cfg.ycocg, "codec path requires ycocg=True"
        self.cfg = cfg
        self.params = params
        self.model = LLICTIModel(cfg=cfg)
        self.pool = futures.ThreadPoolExecutor(max_workers=num_threads)

        M = cfg.num_mixtures

        # ---- shared jitted functions (encoder & decoder both call these,
        # ---- at identical granularity) ------------------------------------
        @partial(jax.jit, static_argnums=(2, 3))
        def band_params_fn(params_, y_cond, scl, b):
            return self.model.apply(params_, y_cond, scl, b,
                                    method=LLICTIModel.band_params)

        @partial(jax.jit, static_argnums=(4, 5, 6))
        def cdf_u16_fn(pmap, y0, y1, shift255, clr, minv, maxv):
            """uint16 CDF table [1,h,w,P] for one color of one band.

            pmap: [1,h,w,12M] parameter map; y0/y1: earlier colors of the
            band being coded ([1,h,w,1], zeros when unused); shift255 is
            unused here (kept for signature stability).
            Mirrors reference LLICTI_nets.py:380-405 / 465-493.
            """
            stdevs = pmap[..., (0 * 3 + clr) * M:(0 * 3 + clr + 1) * M]
            means = pmap[..., (1 * 3 + clr) * M:(1 * 3 + clr + 1) * M]
            weights = pmap[..., (2 * 3 + clr) * M:(2 * 3 + clr + 1) * M]
            if clr == 1:
                aw = pmap[..., 9 * M:10 * M]
                means = means + aw * y0
            elif clr == 2:
                bw = pmap[..., 10 * M:11 * M]
                dw = pmap[..., 11 * M:12 * M]
                means = means + bw * y0 + dw * y1
            pts = cdf_sampling_points(minv, maxv)
            cdf = gmm_cdf_table(pts, stdevs, means, weights)
            return cdf_float_to_uint16(cdf)

        @jax.jit
        def gather_lohi_fn(cdfu, sym):
            """Per-pixel (cdf[s], cdf[s+1]) gather — encode-path transfer."""
            s = sym[..., None]
            lo = jnp.take_along_axis(cdfu, s, axis=-1)[..., 0]
            hi = jnp.take_along_axis(cdfu, s + 1, axis=-1)[..., 0]
            return lo, hi

        @jax.jit
        def symbols_fn(y, minv):
            """Float band values -> coder symbols (v_int - minv)."""
            return (jnp.round(y * 255.0).astype(jnp.int32) - minv).astype(jnp.int32)

        @jax.jit
        def int_to_unit_fn(v, minv):
            """Symbols -> floats (v + minv) * (1/255), the same single IEEE
            multiply the encoder preprocessing uses (a division could be
            rewritten differently by XLA across the two programs)."""
            return (v + minv).astype(jnp.float32) * INV255

        @partial(jax.jit, static_argnums=(1,))
        def preprocess_fn(rgb_int, last_stride):
            """RGB uint8 -> (x_float YCoCg zero-mean, min/max CoCg, raw x00)."""
            ycocg = rgb_int_to_ycocg_r_int(rgb_int)
            min_co = jnp.min(ycocg[..., 1])
            max_co = jnp.max(ycocg[..., 1])
            min_cg = jnp.min(ycocg[..., 2])
            max_cg = jnp.max(ycocg[..., 2])
            shift = jnp.array([127, 0, 0], jnp.int32)
            x = (ycocg - shift).astype(jnp.float32) * INV255
            x00_raw = rgb_int[:, ::last_stride, ::last_stride, :].astype(jnp.uint8)
            return x, (min_co, max_co, min_cg, max_cg), x00_raw

        @jax.jit
        def postprocess_fn(y_3ch):
            """Decoded YCoCg floats -> RGB uint8 (exact int inverse)."""
            ycocg = jnp.round(y_3ch * 255.0).astype(jnp.int32) + jnp.array(
                [127, 0, 0], jnp.int32)
            rgb = ycocg_r_int_to_rgb_int(ycocg)
            return rgb.astype(jnp.uint8)

        @partial(jax.jit, static_argnums=(2,))
        def set_channel_fn(y_lev, vals, ch):
            return y_lev.at[..., ch].set(vals[..., 0] if vals.ndim == 4 else vals)

        self._band_params = band_params_fn
        self._cdf_u16 = cdf_u16_fn
        self._gather_lohi = gather_lohi_fn
        self._symbols = symbols_fn
        self._int_to_unit = int_to_unit_fn
        self._preprocess = preprocess_fn
        self._postprocess = postprocess_fn
        self._set_channel = set_channel_fn

    # ------------------------------------------------------------------
    def _clr_range(self, clr: int, minmax: Sequence[int]) -> Tuple[int, int]:
        """(minVal, maxVal) for a color channel, bucketed for Co/Cg.

        Y uses the fixed [-127, 128] grid (reference LLICTI_nets.py:394-395).
        """
        if clr == 0:
            return -127, 128
        min_v = int(minmax[clr])
        max_v = int(minmax[3 + clr])
        return bucket_range(min_v, max_v)

    # ------------------------------------------------------------------
    def compress(self, rgb: np.ndarray) -> List[List[bytes]]:
        """Encode one image. rgb: [H, W, 3] or [1, H, W, 3] uint8."""
        cfg = self.cfg
        if rgb.ndim == 3:
            rgb = rgb[None]
        assert rgb.ndim == 4 and rgb.shape[0] == 1 and rgb.shape[-1] == 3
        rgb_dev = jnp.asarray(rgb.astype(np.int32))
        last_stride = 2 ** (max(cfg.dwtlevels) + 1)
        x, mm, x00_raw = self._preprocess(rgb_dev, last_stride)
        min_co, max_co, min_cg, max_cg = (int(v) for v in jax.device_get(mm))
        minmax = [0, min_co, min_cg, 255, max_co, max_cg]

        y_list, pad_flags, pad_int = lazy_dwt(x, cfg.dwtlevels, pad=True)
        S = cfg.num_scales
        last_h, last_w = y_list[S - 1].shape[1], y_list[S - 1].shape[2]

        header = (np.array([S], np.uint8).tobytes()
                  + np.array([last_h, last_w], np.uint16).tobytes())
        header_minmax = np.array(minmax, np.int16).tobytes()
        header_pad = np.array([pad_int], np.int16).tobytes()
        raw = np.asarray(jax.device_get(x00_raw)).tobytes()
        streams: List[List[bytes]] = [
            [header, header_minmax, header_pad, raw, b"", b"", b"", b"", b""]
        ]

        # per-(scale,band,color) encode jobs run on the host thread pool
        jobs = {}
        scale_payloads = []
        for scl in range(S - 1, -1, -1):
            y_lev = y_list[scl]
            padH, padW = pad_flags[scl]
            h, w = y_lev.shape[1], y_lev.shape[2]
            payload = []
            for b in range(3):
                pmap = self._band_params(self.params, y_lev[..., 0:3 * (b + 1)],
                                         scl, b)
                y_band = y_lev[..., 3 * (b + 1):3 * (b + 2)]
                ch_, cw_ = band_coded_shape(h, w, b, padH, padW)
                for clr in range(3):
                    minv, maxv = self._clr_range(clr, minmax)
                    y0 = y_band[..., 0:1]
                    y1 = y_band[..., 1:2]
                    cdfu = self._cdf_u16(pmap, y0, y1, 0, clr, minv, maxv)
                    sym = self._symbols(y_band[..., clr], minv)
                    lo, hi = self._gather_lohi(cdfu, sym)
                    payload.append((lo[:, :ch_, :cw_], hi[:, :ch_, :cw_]))
            scale_payloads.append((scl, payload))

        # transfer lo/hi pairs and fan out range coding across threads
        for scl, payload in scale_payloads:
            lohis = jax.device_get(payload)
            for idx, (lo, hi) in enumerate(lohis):
                jobs[(scl, idx)] = self.pool.submit(
                    coder.encode_lohi, np.asarray(lo), np.asarray(hi))

        for scl, _ in scale_payloads:
            streams.append([jobs[(scl, i)].result() for i in range(9)])
        return streams

    # ------------------------------------------------------------------
    def decompress(self, streams: List[List[bytes]]) -> np.ndarray:
        """Decode a bitstream list back to [1, H, W, 3] uint8 RGB."""
        cfg = self.cfg
        S = int(np.frombuffer(streams[0][0][:1], np.uint8)[0])
        assert S == cfg.num_scales
        last_h, last_w = (int(v) for v in
                          np.frombuffer(streams[0][0][1:5], np.uint16))
        minmax = [int(v) for v in np.frombuffer(streams[0][1], np.int16)]
        pad_int = int(np.frombuffer(streams[0][2], np.int16)[0])
        pad_flags = unpack_pad_flags(pad_int, S)
        raw = np.frombuffer(streams[0][3], np.uint8).reshape(1, last_h, last_w, 3)

        ycocg0 = rgb_int_to_ycocg_r_int(jnp.asarray(raw.astype(np.int32)))
        x00 = self._int_to_unit(
            ycocg0 - jnp.array([127, 0, 0], jnp.int32), jnp.int32(0))

        y_lev = jnp.zeros((1, last_h, last_w, 12), jnp.float32)
        for ch in range(3):
            y_lev = self._set_channel(y_lev, x00[..., ch], ch)

        for scl in range(S - 1, -1, -1):
            if scl != S - 1:
                # interleave previous (coarser) scale into this scale's x00
                crop_h = int(pad_flags[scl + 1][0])
                crop_w = int(pad_flags[scl + 1][1])
                x00 = interleave_scale(y_lev, 3, crop_h, crop_w)
                h, w = x00.shape[1], x00.shape[2]
                y_lev = jnp.zeros((1, h, w, 12), jnp.float32)
                for ch in range(3):
                    y_lev = self._set_channel(y_lev, x00[..., ch], ch)
            padH, padW = pad_flags[scl]
            h, w = y_lev.shape[1], y_lev.shape[2]
            sc_streams = streams[1 + (S - 1 - scl)]
            for b in range(3):
                pmap = self._band_params(self.params, y_lev[..., 0:3 * (b + 1)],
                                         scl, b)
                ch_, cw_ = band_coded_shape(h, w, b, padH, padW)
                decoded_cols = []
                for clr in range(3):
                    minv, maxv = self._clr_range(clr, minmax)
                    if clr == 0:
                        y0 = jnp.zeros((1, h, w, 1), jnp.float32)
                        y1 = y0
                    elif clr == 1:
                        y0 = decoded_cols[0][..., None]
                        y1 = jnp.zeros((1, h, w, 1), jnp.float32)
                    else:
                        y0 = decoded_cols[0][..., None]
                        y1 = decoded_cols[1][..., None]
                    cdfu = self._cdf_u16(pmap, y0, y1, 0, clr, minv, maxv)
                    cdf_host = np.asarray(
                        jax.device_get(cdfu[:, :ch_, :cw_]))
                    syms = coder.decode_cdf(
                        cdf_host.reshape(-1, cdf_host.shape[-1]),
                        sc_streams[b * 3 + clr])
                    syms = syms.reshape(1, ch_, cw_).astype(np.int32)
                    vals = self._int_to_unit(jnp.asarray(syms), jnp.int32(minv))
                    vals = pad_decoded_band(vals[..., None], b, padH, padW)[..., 0]
                    decoded_cols.append(vals)
                    y_lev = self._set_channel(y_lev, vals, 3 * (b + 1) + clr)
        # final interleave to full resolution
        crop_h = int(pad_flags[0][0])
        crop_w = int(pad_flags[0][1])
        y_3ch = interleave_scale(y_lev, 3, crop_h, crop_w)
        return np.asarray(jax.device_get(self._postprocess(y_3ch)))

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
