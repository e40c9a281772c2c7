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
from .ops.cdf_pallas import gmm_cdf_table_int32_pallas
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
    """Round a symbol range outward to RANGE_BUCKET multiples (keeps the
    jit cache small; the near-zero-probability extra bins cost <0.002
    bits/sym)."""
    lo = (min_val // RANGE_BUCKET) * RANGE_BUCKET
    hi = -((-(max_val + 1)) // RANGE_BUCKET) * RANGE_BUCKET - 1
    return int(lo), int(hi)


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

    Supports the reference's live codec configuration (clrchs=3,
    clr_joint_mode=2, normal GMM — the reference codec supports exactly
    this subset, LLICTI_nets.py:937-939).
    """

    def __init__(self, cfg: ModelConfig, params, backend: str = "device",
                 num_lanes: int = 512, num_threads: int = 8,
                 use_pallas_cdf: bool = False):
        assert cfg.clrchs == 3 and cfg.clr_joint_mode == 2, (
            "codec path requires clrchs=3, clr_joint_mode=2 (as reference)")
        assert cfg.distribution == "normal" and cfg.num_mixtures > 1
        assert cfg.ycocg, "codec path requires ycocg=True"
        assert backend in ("device", "host")
        self.cfg = cfg
        self.params = params
        self.backend = backend
        self.N = num_lanes
        self.model = LLICTIModel(cfg=cfg)
        self.pool = futures.ThreadPoolExecutor(max_workers=num_threads)
        self.last_slice_bits: Optional[List[List[int]]] = None

        M = cfg.num_mixtures

        # ---- shared jitted programs (both directions call these with the
        # ---- same shapes; the jit cache makes them the same executables).
        # ---- Conditioning slices happen *inside* the programs: every eager
        # ---- op is a host round-trip on the TPU tunnel.
        @partial(jax.jit, static_argnums=(2, 3))
        def band_params_fn(params_, y_lev, scl, b):
            return self.model.apply(params_, y_lev[..., 0:3 * (b + 1)],
                                    scl, b, method=LLICTIModel.band_params)

        def _cdf_float(pmap, y_lev, b, clr, minv, maxv):
            stdevs, means, weights = _gmm_params(pmap, y_lev, b, clr)
            pts = cdf_sampling_points(minv, maxv)
            return gmm_cdf_table(pts, stdevs, means, weights)

        @partial(jax.jit, static_argnums=(2, 3, 4, 5))
        def cdf_u16_fn(pmap, y_lev, b, clr, minv, maxv):
            """[1,h,w,P] uint16 table (host-backend contract)."""
            return cdf_float_to_uint16(
                _cdf_float(pmap, y_lev, b, clr, minv, maxv))

        def _gmm_params(pmap, y_lev, b, clr):
            y0 = y_lev[..., 3 * (b + 1):3 * (b + 1) + 1]
            y1 = y_lev[..., 3 * (b + 1) + 1:3 * (b + 1) + 2]
            stdevs = pmap[..., clr * M:(clr + 1) * M]
            means = pmap[..., (3 + clr) * M:(3 + clr + 1) * M]
            weights = pmap[..., (6 + clr) * M:(6 + clr + 1) * M]
            if clr == 1:
                means = means + pmap[..., 9 * M:10 * M] * y0
            elif clr == 2:
                means = means + (pmap[..., 10 * M:11 * M] * y0
                                 + pmap[..., 11 * M:12 * M] * y1)
            return stdevs, means, weights

        @partial(jax.jit, static_argnums=(2, 3, 4, 5))
        def cdf_cum_fn(pmap, y_lev, b, clr, minv, maxv):
            """[1,h,w,P] int32 cum table (device-backend contract)."""
            if use_pallas_cdf:
                stdevs, means, weights = _gmm_params(pmap, y_lev, b, clr)
                pts = cdf_sampling_points(minv, maxv)
                return gmm_cdf_table_int32_pallas(pts, stdevs, means, weights)
            return rd.cdf_float_to_cum_int32(
                _cdf_float(pmap, y_lev, b, clr, minv, maxv))

        # ---- front end (encode): one program per image shape -------------
        @partial(jax.jit, static_argnums=(1,))
        def front_fn(rgb_int, levels):
            ycocg = rgb_int_to_ycocg_r_int(rgb_int)
            mm = (jnp.min(ycocg[..., 1]), jnp.max(ycocg[..., 1]),
                  jnp.min(ycocg[..., 2]), jnp.max(ycocg[..., 2]))
            shift = jnp.array([127, 0, 0], jnp.int32)
            x = (ycocg - shift).astype(jnp.float32) * INV255
            last_stride = 2 ** (max(levels) + 1)
            x00_raw = rgb_int[:, ::last_stride, ::last_stride, :].astype(
                jnp.uint8)
            y_list, _, _ = lazy_dwt(x, levels, pad=True)
            return tuple(y_list), mm, x00_raw

        # ---- per-slice programs ------------------------------------------
        @partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
        def startfreq_fn(cum, y_lev, b, clr, ch, cw, minv):
            """Per-symbol (start, freq) int32 over the coded region,
            row-major, padded to a power-of-two bucket with freq=0
            sentinel symbols (masked out by the encoder), so the rANS
            encoder compiles per bucket, not per slice size."""
            y = y_lev[:, :ch, :cw, 3 * (b + 1) + clr]
            sym = (jnp.round(y * 255.0).astype(jnp.int32) - minv)
            s = sym[..., None]
            c = cum[:, :ch, :cw]
            lo = jnp.take_along_axis(c, s, axis=-1)[..., 0]
            hi = jnp.take_along_axis(c, s + 1, axis=-1)[..., 0]
            n = ch * cw
            bucket = max(64, -(-n // 4096) * 4096)
            starts = jnp.pad(lo.reshape(-1), (0, bucket - n))
            freqs = jnp.pad((hi - lo).reshape(-1), (0, bucket - n))
            return starts, freqs

        @partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
        def gather_lohi_fn(cdfu, y_lev, b, clr, ch, cw, minv):
            """Host-backend encode transfer: 2 uint16 per pixel."""
            y = y_lev[:, :ch, :cw, 3 * (b + 1) + clr]
            sym = (jnp.round(y * 255.0).astype(jnp.int32) - minv)
            s = sym[..., None]
            c = cdfu[:, :ch, :cw]
            lo = jnp.take_along_axis(c, s, axis=-1)[..., 0]
            hi = jnp.take_along_axis(c, s + 1, axis=-1)[..., 0]
            return lo, hi

        # ---- decode-side programs ----------------------------------------
        @partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
        def decode_step_fn(cum, words, states, offset, y_lev,
                           b, clr, padH, padW, ch, cw, num_lanes, minv):
            """rANS-decode one slice and write it back into y_lev."""
            n = ch * cw
            cum2 = cum[:, :ch, :cw].reshape(n, -1)
            syms, states, offset = rd.rans_decode_body(
                cum2, words, states, offset, num_lanes, n)
            vals = (syms.reshape(1, ch, cw) + minv).astype(jnp.float32) * INV255
            vals = pad_decoded_band(vals[..., None], b, padH, padW)
            y_lev = y_lev.at[..., 3 * (b + 1) + clr].set(vals[..., 0])
            return y_lev, states, offset

        @partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 8))
        def writeback_fn(y_lev, b, clr, padH, padW, ch, cw, syms, minv):
            """Decoded symbols -> float channel of y_lev (host backend)."""
            vals = (syms.reshape(1, ch, cw) + minv).astype(jnp.float32) * INV255
            vals = pad_decoded_band(vals[..., None], b, padH, padW)
            y_lev = y_lev.at[..., 3 * (b + 1) + clr].set(vals[..., 0])
            return y_lev

        @partial(jax.jit, static_argnums=(1, 2))
        def next_scale_fn(y_lev, crop_h, crop_w):
            """Interleave a finished scale into the next finer x00."""
            x00 = interleave_scale(y_lev, 3, crop_h, crop_w)
            h, w = x00.shape[1], x00.shape[2]
            out = jnp.zeros((1, h, w, 12), jnp.float32)
            return out.at[..., 0:3].set(x00)

        @jax.jit
        def init_scale_fn(raw_rgb_uint8):
            """Raw RGB header band -> coarsest y_lev (ycocg + shift, all on
            device — no host round trip)."""
            ycocg = rgb_int_to_ycocg_r_int(raw_rgb_uint8.astype(jnp.int32))
            shift = jnp.array([127, 0, 0], jnp.int32)
            x00 = (ycocg - shift).astype(jnp.float32) * INV255
            h, w = x00.shape[1], x00.shape[2]
            out = jnp.zeros((1, h, w, 12), jnp.float32)
            return out.at[..., 0:3].set(x00)

        @partial(jax.jit, static_argnums=(1,))
        def pad_words_fn(w, cap):
            """Small upload -> fixed worst-case-shaped stream buffer, so the
            decode programs' shapes depend only on the image shape (a
            stream-length-dependent shape would recompile the 45 scan
            programs whenever the compressed size changes)."""
            return jnp.zeros(cap, w.dtype).at[: w.shape[0]].set(w)

        @jax.jit
        def postprocess_fn(y_3ch):
            ycocg = jnp.round(y_3ch * 255.0).astype(jnp.int32) + jnp.array(
                [127, 0, 0], jnp.int32)
            return ycocg_r_int_to_rgb_int(ycocg).astype(jnp.uint8)

        self._band_params = band_params_fn
        self._cdf_u16 = cdf_u16_fn
        self._cdf_cum = cdf_cum_fn
        self._front = front_fn
        self._startfreq = startfreq_fn
        self._gather_lohi = gather_lohi_fn
        self._decode_step = decode_step_fn
        self._writeback = writeback_fn
        self._next_scale = next_scale_fn
        self._init_scale = init_scale_fn
        self._pad_words = pad_words_fn
        self._postprocess = postprocess_fn

    # ------------------------------------------------------------------
    def _clr_range(self, clr: int, minmax: Sequence[int]) -> Tuple[int, int]:
        """Symbol range per color; Y fixed [-127, 128] (reference
        LLICTI_nets.py:394-395), Co/Cg bucketed dynamic."""
        if clr == 0:
            return -127, 128
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

    def _words_cap(self, S, last_h, last_w, pad_flags) -> int:
        """Worst-case stream words, derived from the image shape only."""
        total = self.N
        for scl, h, w in self._scale_shapes(S, last_h, last_w, pad_flags):
            padH, padW = pad_flags[scl]
            for b in range(3):
                ch, cw = band_coded_shape(h, w, b, padH, padW)
                for _clr in range(3):
                    bucket = max(64, -(-(ch * cw) // 4096) * 4096)
                    total += -(-bucket // self.N) * self.N
        return -(-total // 65536) * 65536

    def _header_group(self, S, last_h, last_w, minmax, pad_int, raw
                      ) -> List[bytes]:
        header = (np.array([S], np.uint8).tobytes()
                  + np.array([last_h, last_w], np.uint16).tobytes())
        return [header, np.array(minmax, np.int16).tobytes(),
                np.array([pad_int], np.int16).tobytes(), raw,
                b"", b"", b"", b"", b""]

    # ------------------------------------------------------------------
    def compress(self, rgb: np.ndarray) -> List[List[bytes]]:
        """Encode one image. rgb: [H, W, 3] or [1, H, W, 3] uint8."""
        cfg = self.cfg
        if rgb.ndim == 3:
            rgb = rgb[None]
        assert rgb.shape[0] == 1 and rgb.shape[-1] == 3
        H, W = rgb.shape[1], rgb.shape[2]
        pad_flags, pad_int = pad_flags_for_shape(H, W, cfg.dwtlevels)
        S = cfg.num_scales

        y_list, mm, x00_raw = self._front(jnp.asarray(rgb.astype(np.int32)),
                                          cfg.dwtlevels)
        # one host sync for min/max + the raw header band together
        mm_np, x00_np = jax.device_get((mm, x00_raw))
        min_co, max_co, min_cg, max_cg = (int(v) for v in mm_np)
        minmax = [0, min_co, min_cg, 255, max_co, max_cg]
        last_h, last_w = y_list[S - 1].shape[1], y_list[S - 1].shape[2]
        raw = np.asarray(x00_np).tobytes()
        streams: List[List[bytes]] = [
            self._header_group(S, last_h, last_w, minmax, pad_int, raw)]

        if self.backend == "device":
            return self._compress_device(streams, y_list, minmax, pad_flags)
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

    def _compress_device(self, streams, y_list, minmax, pad_flags):
        cfg = self.cfg
        S = cfg.num_scales
        # gather per-slice (start, freq) in decode order
        slice_sf = []  # (starts, freqs) device arrays
        slice_meta = []  # (scl, b, clr)
        for scl in range(S - 1, -1, -1):
            y_lev = y_list[scl]
            for (b, clr, minv, maxv, ch, cw, pmap
                 ) in self._slices(y_lev, scl, pad_flags, minmax):
                cum = self._cdf_cum(pmap, y_lev, b, clr, minv, maxv)
                st, fr = self._startfreq(cum, y_lev, b, clr, ch, cw, minv)
                slice_sf.append((st, fr))
                slice_meta.append((scl, b, clr))
        # chained rANS encode in reverse decode order, all slices writing
        # into one shared (donated) buffer — a single small transfer at the
        # end instead of 45 worst-case-sized ones
        cap = sum(-(-int(st.shape[0]) // self.N) * self.N
                  for st, _ in slice_sf) + self.N
        cap = -(-cap // 65536) * 65536
        states = jnp.full(self.N, rd.RANS_L, jnp.uint32)
        buf = jnp.zeros(cap, jnp.int32)
        cursor = jnp.int32(0)
        cursors = []
        for st, fr in reversed(slice_sf):
            buf, cursor, states = rd.rans_encode_slice(
                st, fr, states, cursor, buf, self.N)
            cursors.append(cursor)
        cursors_np, states_np = jax.device_get((cursors, states))
        total = int(cursors_np[-1])
        bucket = min(cap, -(-max(1, total) // 65536) * 65536)
        packed = np.asarray(jax.device_get(buf[:bucket]))[:total]
        blob = rd.pack_stream_packed(packed, np.asarray(states_np))
        streams.append([blob])
        # per-slice word counts (encode order cursors -> decode order bits)
        counts = np.diff(np.concatenate([[0], cursors_np])).astype(int)
        counts_decode_order = list(reversed([int(c) for c in counts]))
        bits: Dict[Tuple[int, int, int], int] = {}
        for (scl, b, clr), c in zip(slice_meta, counts_decode_order):
            bits[(scl, b, clr)] = c * 16
        self.last_slice_bits = [
            [bits[(scl, b, clr)] for b in range(3) for clr in range(3)]
            for scl in range(S - 1, -1, -1)
        ]
        return streams

    def _decompress_device(self, streams, S, minmax, pad_flags, raw):
        cfg = self.cfg
        blob = streams[1][0]
        states_np, words_np = rd.unpack_stream(blob, self.N)
        states = jnp.asarray(states_np, jnp.uint32)
        # upload the (small, bucketed) stream as uint16, then pad on device
        # to the shape-derived worst-case buffer so decode program shapes
        # never depend on the compressed size
        up = -(-max(1, words_np.size) // 16384) * 16384
        w_small = jnp.asarray(
            np.pad(words_np.astype(np.uint16), (0, up - words_np.size)))
        S_ = S
        lh = raw.shape[1]
        lw = raw.shape[2]
        cap = self._words_cap(S_, lh, lw, pad_flags)
        words = self._pad_words(w_small, cap)
        offset = jnp.int32(0)
        y_lev = self._init_scale(jnp.asarray(raw))
        for scl in range(S - 1, -1, -1):
            if scl != S - 1:
                y_lev = self._next_scale(y_lev, int(pad_flags[scl + 1][0]),
                                         int(pad_flags[scl + 1][1]))
            padH, padW = pad_flags[scl]
            h, w = y_lev.shape[1], y_lev.shape[2]
            for b in range(3):
                pmap = self._band_params(self.params, y_lev, scl, b)
                ch, cw = band_coded_shape(h, w, b, padH, padW)
                for clr in range(3):
                    minv, maxv = self._clr_range(clr, minmax)
                    cum = self._cdf_cum(pmap, y_lev, b, clr, minv, maxv)
                    y_lev, states, offset = self._decode_step(
                        cum, words, states, offset, y_lev,
                        b, clr, padH, padW, ch, cw, self.N, minv)
        y_3ch = interleave_scale(y_lev, 3, int(pad_flags[0][0]),
                                 int(pad_flags[0][1]))
        return np.asarray(jax.device_get(self._postprocess(y_3ch)))

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
                cdfu = self._cdf_u16(pmap, y_lev, b, clr, minv, maxv)
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
                    cdfu = self._cdf_u16(pmap, y_lev, b, clr, minv, maxv)
                    cdf_host = np.asarray(
                        jax.device_get(cdfu[:, :ch, :cw]))
                    syms = coder.decode_cdf(
                        cdf_host.reshape(-1, cdf_host.shape[-1]),
                        sc_streams[b * 3 + clr])
                    syms = jnp.asarray(syms.astype(np.int32))
                    y_lev = self._writeback(y_lev, b, clr, padH, padW,
                                            ch, cw, syms, minv)
        y_3ch = interleave_scale(y_lev, 3, int(pad_flags[0][0]),
                                 int(pad_flags[0][1]))
        return np.asarray(jax.device_get(self._postprocess(y_3ch)))

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
        raw = np.frombuffer(streams[0][3], np.uint8).reshape(
            1, last_h, last_w, 3)
        if len(streams) == 2 and len(streams[1]) == 1:
            return self._decompress_device(streams, S, minmax, pad_flags, raw)
        return self._decompress_host(streams, S, minmax, pad_flags, raw)

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
