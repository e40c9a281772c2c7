"""Spatially-sharded multi-chip codec: per-shard bitstreams + GSPMD halos.

TPU-native scale-out of the codec path (SURVEY.md §2.3.3-4): the image's
rows are sharded over a 1-D ``sp`` mesh axis; each device entropy-codes
its own tile with its own chained rANS stream, while the interpolator
convs and CDF tables run under GSPMD — XLA inserts the halo exchanges
(collective-permute over ICI) for the small layer-0 receptive fields
automatically.  The reference has no distributed codec at all
(single-GPU, graphs/models/LLICTI_nets.py:344-509); this is the
spatial/context-parallel analog built for a TPU mesh.

Bit-exactness across encode/decode holds for the same reason as the
single-chip codec (llicti_tpu/codec.py): both directions call the same
jitted programs with identical shapes *and identical shardings*, so XLA
compiles them once and both sides see the same floats on every device.

Simplifications vs the single-chip codec:
* The image is replicate-padded up front so H is a multiple of
  G * 2**(Lmax+1) and W of 2**(Lmax+1) (original size in the header,
  cropped after decode).  Pad-flag bookkeeping then vanishes: every
  band is coded full-size.  The few padded rows are highly predictable
  (replicated pixels) so their rate cost is small.
* One rANS stream per shard (G blobs); lane states flush per shard.

Bitstream layout:
  streams[0] = [hdr, minmax_int16, raw_x00_rgb]
      hdr = [S u8, G u8, last_h u16, last_w u16, orig_H u32, orig_W u32]
  streams[1] = [blob_0, ..., blob_{G-1}]
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..coder import rans_device as rd
from ..config import ModelConfig
from ..models.llicti import LLICTIModel
from ..ops.color import rgb_int_to_ycocg_r_int, ycocg_r_int_to_rgb_int
from ..ops.gmm import cdf_sampling_points, gmm_cdf_table

INV255 = np.float32(1.0 / 255.0)
RANGE_BUCKET = 32


def make_sp_mesh(shards: Optional[int] = None,
                 devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shards is not None:
        devices = devices[:shards]
    return Mesh(np.array(devices), axis_names=("sp",))


def _bucket_range(min_val: int, max_val: int) -> Tuple[int, int]:
    lo = (min_val // RANGE_BUCKET) * RANGE_BUCKET
    hi = -((-(max_val + 1)) // RANGE_BUCKET) * RANGE_BUCKET - 1
    return int(lo), int(hi)


def _bucket(n: int) -> int:
    return max(64, -(-n // 4096) * 4096)


class ShardedCodec:
    """Encoder/decoder sharding H over a 1-D device mesh.

    Per-shard independent rANS streams; NN/CDF math under GSPMD with
    automatic halo exchange.  Supports the same model subset as the
    single-chip Codec (clrchs=3, clr_joint_mode=2, normal GMM).
    """

    def __init__(self, cfg: ModelConfig, params, mesh: Optional[Mesh] = None,
                 num_lanes: int = 128):
        assert cfg.clrchs == 3 and cfg.clr_joint_mode == 2
        assert cfg.distribution == "normal" and cfg.num_mixtures > 1
        assert cfg.ycocg
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_sp_mesh()
        self.G = self.mesh.devices.size
        self.N = num_lanes
        self.last_slice_bits = None  # per-slice breakdown (single-chip only)
        self.model = LLICTIModel(cfg=cfg)
        M = cfg.num_mixtures
        mesh_ = self.mesh
        G, N = self.G, self.N

        repl = NamedSharding(mesh_, P())
        sh_img = NamedSharding(mesh_, P(None, "sp", None, None))
        sh_row = NamedSharding(mesh_, P("sp"))
        self.sh_img = sh_img
        self.repl = repl
        self.params = jax.device_put(params, repl)

        # ---- shared GSPMD programs (encode and decode both call these
        # ---- with identical shapes+shardings -> same executables) -------
        @partial(jax.jit, static_argnums=(2, 3),
                 in_shardings=(repl, sh_img), out_shardings=sh_img)
        def band_params_fn(params_, y_lev, scl, b):
            return self.model.apply(params_, y_lev[..., 0:3 * (b + 1)],
                                    scl, b, method=LLICTIModel.band_params)

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

        @partial(jax.jit, static_argnums=(2, 3, 4, 5),
                 in_shardings=(sh_img, sh_img), out_shardings=sh_img)
        def cdf_cum_fn(pmap, y_lev, b, clr, minv, maxv):
            stdevs, means, weights = _gmm_params(pmap, y_lev, b, clr)
            pts = cdf_sampling_points(minv, maxv)
            return rd.cdf_float_to_cum_int32(
                gmm_cdf_table(pts, stdevs, means, weights))

        # ---- front end (encode) ------------------------------------------
        @partial(jax.jit, static_argnums=(1,), in_shardings=(sh_img,))
        def front_fn(rgb_u8, levels):
            from ..ops.wavelet import lazy_dwt

            rgb_int = rgb_u8.astype(jnp.int32)
            ycocg = rgb_int_to_ycocg_r_int(rgb_int)
            mm = (jnp.min(ycocg[..., 1]), jnp.max(ycocg[..., 1]),
                  jnp.min(ycocg[..., 2]), jnp.max(ycocg[..., 2]))
            shift = jnp.array([127, 0, 0], jnp.int32)
            x = (ycocg - shift).astype(jnp.float32) * INV255
            last_stride = 2 ** (max(levels) + 1)
            x00_raw = rgb_int[:, ::last_stride, ::last_stride, :].astype(
                jnp.uint8)
            y_list = lazy_dwt(x, levels, pad=False)
            y_list = [jax.lax.with_sharding_constraint(y, sh_img)
                      for y in y_list]
            return tuple(y_list), mm, x00_raw

        # ---- per-shard symbol (start, freq) gather ------------------------
        def _startfreq_body(cum_blk, y_blk, b, clr, minv, n_loc):
            y = y_blk[0, :, :, 3 * (b + 1) + clr]
            sym = (jnp.round(y * 255.0).astype(jnp.int32) - minv)[..., None]
            c = cum_blk[0]
            lo = jnp.take_along_axis(c, sym, axis=-1)[..., 0]
            hi = jnp.take_along_axis(c, sym + 1, axis=-1)[..., 0]
            bkt = _bucket(n_loc)
            starts = jnp.pad(lo.reshape(-1), (0, bkt - n_loc))
            freqs = jnp.pad((hi - lo).reshape(-1), (0, bkt - n_loc))
            return starts[None], freqs[None]

        @partial(jax.jit, static_argnums=(2, 3, 4, 5))
        def startfreq_fn(cum, y_lev, b, clr, minv, n_loc):
            body = partial(_startfreq_body, b=b, clr=clr, minv=minv,
                           n_loc=n_loc)
            return jax.shard_map(
                body, mesh=mesh_,
                in_specs=(P(None, "sp", None, None), P(None, "sp", None, None)),
                out_specs=(P("sp"), P("sp")), check_vma=False)(cum, y_lev)

        # ---- per-shard chained rANS encode --------------------------------
        def _enc_body(st, fr, states, cursor, buf):
            b2, c2, s2 = rd.rans_encode_body(st[0], fr[0], states[0],
                                             cursor[0], buf[0], N)
            return b2[None], c2[None], s2[None]

        @partial(jax.jit, donate_argnums=(4,))
        def encode_slice_fn(starts, freqs, states, cursors, bufs):
            return jax.shard_map(
                _enc_body, mesh=mesh_,
                in_specs=(P("sp"), P("sp"), P("sp"), P("sp"), P("sp")),
                out_specs=(P("sp"), P("sp"), P("sp")),
                check_vma=False)(starts, freqs, states, cursors, bufs)

        # ---- per-shard rANS decode + write-back ----------------------------
        def _dec_body(cum_blk, words_blk, states_blk, off_blk, y_blk,
                      b, clr, h_loc, w, minv):
            n = h_loc * w
            cum2 = cum_blk[0].reshape(n, -1)
            syms, st, off = rd.rans_decode_body(
                cum2, words_blk[0], states_blk[0], off_blk[0], N, n)
            vals = (syms.reshape(1, h_loc, w) + minv).astype(
                jnp.float32) * INV255
            y_blk = y_blk.at[..., 3 * (b + 1) + clr].set(vals)
            return y_blk, st[None], off[None]

        @partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
        def decode_step_fn(cum, words, states, offs, y_lev,
                           b, clr, h_loc, w, minv):
            body = partial(_dec_body, b=b, clr=clr, h_loc=h_loc, w=w,
                           minv=minv)
            return jax.shard_map(
                body, mesh=mesh_,
                in_specs=(P(None, "sp", None, None), P("sp"), P("sp"),
                          P("sp"), P(None, "sp", None, None)),
                out_specs=(P(None, "sp", None, None), P("sp"), P("sp")),
                check_vma=False)(cum, words, states, offs, y_lev)

        # ---- scale plumbing ------------------------------------------------
        @partial(jax.jit, in_shardings=(sh_img,), out_shardings=sh_img)
        def next_scale_fn(y_lev):
            from ..ops.wavelet import interleave_scale

            x00 = interleave_scale(y_lev, 3)
            h, w = x00.shape[1], x00.shape[2]
            out = jnp.zeros((1, h, w, 12), jnp.float32)
            return out.at[..., 0:3].set(x00)

        @partial(jax.jit, out_shardings=sh_img)
        def init_scale_fn(raw_rgb_uint8):
            ycocg = rgb_int_to_ycocg_r_int(raw_rgb_uint8.astype(jnp.int32))
            shift = jnp.array([127, 0, 0], jnp.int32)
            x00 = (ycocg - shift).astype(jnp.float32) * INV255
            h, w = x00.shape[1], x00.shape[2]
            out = jnp.zeros((1, h, w, 12), jnp.float32)
            return out.at[..., 0:3].set(x00)

        @partial(jax.jit, in_shardings=(sh_img,))
        def postprocess_fn(y_lev):
            from ..ops.wavelet import interleave_scale

            y_3ch = interleave_scale(y_lev, 3)
            ycocg = jnp.round(y_3ch * 255.0).astype(jnp.int32) + jnp.array(
                [127, 0, 0], jnp.int32)
            return ycocg_r_int_to_rgb_int(ycocg).astype(jnp.uint8)

        @partial(jax.jit, static_argnums=(1,))
        def pad_words_fn(w, cap):
            return jnp.zeros((G, cap), w.dtype).at[:, : w.shape[1]].set(w)

        self._band_params = band_params_fn
        self._cdf_cum = cdf_cum_fn
        self._front = front_fn
        self._startfreq = startfreq_fn
        self._encode_slice = encode_slice_fn
        self._decode_step = decode_step_fn
        self._next_scale = next_scale_fn
        self._init_scale = init_scale_fn
        self._postprocess = postprocess_fn
        self._pad_words = pad_words_fn

    # ------------------------------------------------------------------
    def _pad_multiple(self) -> Tuple[int, int]:
        st = 2 ** (max(self.cfg.dwtlevels) + 1)
        return self.G * st, st

    def _clr_range(self, clr: int, minmax) -> Tuple[int, int]:
        if clr == 0:
            return -127, 128
        return _bucket_range(int(minmax[clr]), int(minmax[3 + clr]))

    def _scale_dims(self, S: int, last_h: int, last_w: int):
        """(scl, h, w) per scale in decode order (padded => exact doubling)."""
        h, w = last_h, last_w
        dims = [(S - 1, h, w)]
        for scl in range(S - 2, -1, -1):
            h, w = 2 * h, 2 * w
            dims.append((scl, h, w))
        return dims

    def _words_cap(self, S: int, last_h: int, last_w: int) -> int:
        """Worst-case stream words per shard, shape-derived."""
        total = self.N
        for _scl, h, w in self._scale_dims(S, last_h, last_w):
            n_loc = (h // self.G) * w
            total += 9 * (-(-_bucket(n_loc) // self.N) * self.N)
        return -(-total // 16384) * 16384

    # ------------------------------------------------------------------
    def compress(self, rgb: np.ndarray) -> List[List[bytes]]:
        cfg = self.cfg
        if rgb.ndim == 3:
            rgb = rgb[None]
        assert rgb.shape[0] == 1 and rgb.shape[-1] == 3
        orig_h, orig_w = rgb.shape[1], rgb.shape[2]
        mh, mw = self._pad_multiple()
        H = -(-orig_h // mh) * mh
        W = -(-orig_w // mw) * mw
        rgb = np.pad(rgb, ((0, 0), (0, H - orig_h), (0, W - orig_w), (0, 0)),
                     mode="edge")
        S = cfg.num_scales

        x_dev = jax.device_put(rgb.astype(np.uint8), self.sh_img)
        y_list, mm, x00_raw = self._front(x_dev, cfg.dwtlevels)
        mm_np, x00_np = jax.device_get((mm, x00_raw))
        min_co, max_co, min_cg, max_cg = (int(v) for v in mm_np)
        minmax = [0, min_co, min_cg, 255, max_co, max_cg]
        last_h, last_w = y_list[S - 1].shape[1], y_list[S - 1].shape[2]
        raw = np.asarray(x00_np).tobytes()
        hdr = (np.array([S, self.G], np.uint8).tobytes()
               + np.array([last_h, last_w], np.uint16).tobytes()
               + np.array([orig_h, orig_w], np.uint32).tobytes())
        streams: List[List[bytes]] = [
            [hdr, np.array(minmax, np.int16).tobytes(), raw]]

        # gather per-slice (starts, freqs) in decode order
        slice_sf = []
        for scl in range(S - 1, -1, -1):
            y_lev = y_list[scl]
            h, w = y_lev.shape[1], y_lev.shape[2]
            n_loc = (h // self.G) * w
            for b in range(3):
                pmap = self._band_params(self.params, y_lev, scl, b)
                for clr in range(3):
                    minv, maxv = self._clr_range(clr, minmax)
                    cum = self._cdf_cum(pmap, y_lev, b, clr, minv, maxv)
                    slice_sf.append(self._startfreq(cum, y_lev, b, clr,
                                                    minv, n_loc))
        # chained per-shard rANS encode in reverse decode order
        cap = self._words_cap(S, last_h, last_w)
        states = jnp.full((self.G, self.N), rd.RANS_L, jnp.uint32)
        states = jax.device_put(states, NamedSharding(self.mesh, P("sp")))
        bufs = jax.device_put(jnp.zeros((self.G, cap), jnp.int32),
                              NamedSharding(self.mesh, P("sp")))
        cursors = jax.device_put(jnp.zeros((self.G,), jnp.int32),
                                 NamedSharding(self.mesh, P("sp")))
        for st, fr in reversed(slice_sf):
            bufs, cursors, states = self._encode_slice(st, fr, states,
                                                       cursors, bufs)
        cursors_np, states_np = jax.device_get((cursors, states))
        maxc = int(cursors_np.max())
        bucket = min(cap, -(-max(1, maxc) // 16384) * 16384)
        packed = np.asarray(jax.device_get(bufs[:, :bucket]))
        blobs = []
        for g in range(self.G):
            blobs.append(rd.pack_stream_packed(
                packed[g, : int(cursors_np[g])], states_np[g]))
        streams.append(blobs)
        return streams

    # ------------------------------------------------------------------
    def decompress(self, streams: List[List[bytes]]) -> np.ndarray:
        cfg = self.cfg
        hdr = streams[0][0]
        S = int(np.frombuffer(hdr[:1], np.uint8)[0])
        G = int(np.frombuffer(hdr[1:2], np.uint8)[0])
        assert S == cfg.num_scales and G == self.G
        last_h, last_w = (int(v) for v in np.frombuffer(hdr[2:6], np.uint16))
        orig_h, orig_w = (int(v) for v in np.frombuffer(hdr[6:14], np.uint32))
        minmax = [int(v) for v in np.frombuffer(streams[0][1], np.int16)]
        raw = np.frombuffer(streams[0][2], np.uint8).reshape(
            1, last_h, last_w, 3)

        states_np = np.zeros((G, self.N), np.uint32)
        word_arrs = []
        for g, blob in enumerate(streams[1]):
            s, wds = rd.unpack_stream(blob, self.N)
            states_np[g] = s
            word_arrs.append(wds.astype(np.uint16))
        wmax = max(1, max(a.size for a in word_arrs))
        up = -(-wmax // 4096) * 4096
        w_small = np.zeros((G, up), np.uint16)
        for g, a in enumerate(word_arrs):
            w_small[g, : a.size] = a
        cap = self._words_cap(S, last_h, last_w)
        sh_row = NamedSharding(self.mesh, P("sp"))
        words = self._pad_words(
            jax.device_put(jnp.asarray(w_small), sh_row), cap)
        states = jax.device_put(jnp.asarray(states_np), sh_row)
        offs = jax.device_put(jnp.zeros((G,), jnp.int32), sh_row)

        y_lev = self._init_scale(jnp.asarray(raw))
        for scl in range(S - 1, -1, -1):
            if scl != S - 1:
                y_lev = self._next_scale(y_lev)
            h, w = y_lev.shape[1], y_lev.shape[2]
            for b in range(3):
                pmap = self._band_params(self.params, y_lev, scl, b)
                for clr in range(3):
                    minv, maxv = self._clr_range(clr, minmax)
                    cum = self._cdf_cum(pmap, y_lev, b, clr, minv, maxv)
                    y_lev, states, offs = self._decode_step(
                        cum, words, states, offs, y_lev,
                        b, clr, h // self.G, w, minv)
        out = np.asarray(jax.device_get(self._postprocess(y_lev)))
        return out[:, :orig_h, :orig_w, :]

    @staticmethod
    def num_bytes(streams: List[List[bytes]]) -> int:
        return sum(len(s) for g in streams for s in g)
