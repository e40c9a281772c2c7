"""Pallas TPU kernel: interleaved rANS decode scan.

The XLA `lax.scan` decode (rans_device.rans_decode_body) pays per-step
while-loop overhead and re-reads lane state from HBM every iteration.
This kernel walks the same T-step schedule as a sequential Pallas grid:

* lane states live in the output VMEM ref across grid steps (TPU grids
  execute in order, so the ref doubles as carry state);
* each step's cum-table block streams in through a double-buffered
  BlockSpec, TRANSPOSED to [Lp, N] so every per-lane quantity stays in
  the lane-major [1, N] layout — no in-loop transposes, full VPU width;
* the stream itself stays in HBM — each step DMAs only the <=N-word
  refill window at the current (data-dependent) offset into a small
  VMEM scratch (window rounded to 8 rows: sublane-tile-legal DMAs);
* symbol search and word-rank selection are masked reductions/one-hot
  compares (no gathers), like the XLA formulation.

The coder is pure integer arithmetic, so this kernel only has to be
*correct* (the numpy golden model + XLA path define the spec); it does
NOT need to match any float environment.  Wrapper falls back to
interpret mode off-TPU so the same code is CPU-testable.

Status: correct and lossless end-to-end on real TPU, but measured
SLOWER than the gather-free XLA scan formulation (70 ms vs 27 ms for a
98304x513 slice on v5e) — the scalar-offset-dependent per-step window
DMA appears to serialize the mosaic pipeline.  The XLA scan therefore
stays the default decode path (Codec(use_pallas_rans=False)); this
kernel is kept as a tested alternative backend for future tuning.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RANS_L = 1 << 16


def _cumsum_lane(x):
    """Inclusive cumsum along the lane axis of [1, N] via shift-adds."""
    N = x.shape[1]
    shift = 1
    while shift < N:
        shifted = jnp.pad(x, ((0, 0), (shift, 0)))[:, :N]
        x = x + shifted
        shift <<= 1
    return x


def _kernel(states_in, off_in, cum_ref, words_hbm, syms_ref, states_io,
            off_out, win, off_s, sem, *, N, Lp, n, win_rows):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        states_io[...] = states_in[...]
        off_s[0, 0] = off_in[0, 0]

    x = states_io[0, :].reshape(1, N)  # uint32 lane states, lane-major
    block = cum_ref[0]  # [Lp, N] int32 (Lp rows padded with 2^17)
    off = off_s[0, 0]

    # refill window DMA: words rows [off//128, off//128 + win_rows)
    r0 = off // 128
    cp = pltpu.make_async_copy(words_hbm.at[pl.ds(r0, win_rows)], win, sem)
    cp.start()

    slot = (x & 0xFFFF).astype(jnp.int32)  # [1, N]
    le = block <= slot  # [Lp, N]; padded rows are 2^17 > slot -> False
    start32 = jnp.max(jnp.where(le, block, 0), axis=0, keepdims=True)
    nxt32 = jnp.min(jnp.where(le, RANS_L, block), axis=0, keepdims=True)
    s = jnp.sum(le.astype(jnp.int32), axis=0, keepdims=True) - 1  # [1,N]
    freq = (nxt32 - start32).astype(jnp.uint32)
    xn = freq * (x >> 16) + slot.astype(jnp.uint32) - start32.astype(
        jnp.uint32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    valid = (t * N + lane) < n
    need = jnp.logical_and(valid, xn < RANS_L)
    need_i = need.astype(jnp.int32)
    rank = _cumsum_lane(need_i) - need_i  # exclusive prefix count [1,N]

    cp.wait()
    # select word (off + rank): window-local index -> (row, col) one-hot
    tgt = (off % 128) + rank  # [1, N] in [0, 128 + N)
    trow = tgt // 128
    tcol = tgt % 128
    iota128 = jax.lax.broadcasted_iota(jnp.int32, (128, N), 0)
    cmp_c = (tcol == iota128)  # [128, N]: col one-hot per lane
    w = jnp.zeros((1, N), jnp.int32)
    for r in range(win_rows):
        wr = win[r, :].reshape(128, 1)  # window row, one value per sublane
        sel = jnp.sum(jnp.where(cmp_c, wr, 0), axis=0, keepdims=True)
        w = jnp.where(trow == r, sel, w)
    xn = jnp.where(need, (xn << 16) | w.astype(jnp.uint32), xn)
    x = jnp.where(valid, xn, x)

    states_io[...] = x
    new_off = off + jnp.sum(need_i)
    off_s[0, 0] = new_off
    off_out[...] = new_off.reshape(1, 1)
    syms_ref[...] = s.reshape(1, 1, N)


@functools.partial(jax.jit, static_argnums=(4, 5))
def rans_decode_pallas(cum, words, states, offset, num_lanes, n):
    """Drop-in for rans_device.rans_decode_body via the Pallas kernel.

    cum: [n, Lp] int32; words: [W] uint16-valued int; states: [N] uint32;
    offset: scalar int32.  Returns (syms [n] int32, states, offset).
    """
    N = num_lanes
    assert N % 128 == 0, "pallas rANS needs num_lanes % 128 == 0"
    Lp = cum.shape[1]
    T = -(-n // N)
    pad_rows = T * N - n
    if pad_rows:
        cum = jnp.concatenate(
            [cum, jnp.broadcast_to(cum[:1], (pad_rows, Lp))], axis=0)
    Lp_pad = -(-Lp // 8) * 8
    if Lp_pad != Lp:
        cum = jnp.pad(cum, ((0, 0), (0, Lp_pad - Lp)),
                      constant_values=1 << 17)
    # [T, Lp, N]: per-step block transposed so per-lane quantities are
    # lane-major inside the kernel
    cum3 = cum.reshape(T, N, Lp_pad).transpose(0, 2, 1)

    # window rows: N/128 + 1 for the offset remainder, rounded up to a
    # multiple of 8 (int32 sublane tile) so the DMA shape is tile-legal
    win_rows = -(-(N // 128 + 1) // 8) * 8
    # words in HBM, padded to whole rows + a window of slack
    W = words.shape[0]
    rows = -(-W // 128) + win_rows
    words2 = jnp.zeros((rows * 128,), jnp.int32).at[:W].set(
        words.astype(jnp.int32)).reshape(rows, 128)

    states2 = states.reshape(1, N)
    off2 = jnp.full((1, 1), offset, jnp.int32)

    syms, states_out, off_out = pl.pallas_call(
        functools.partial(_kernel, N=N, Lp=Lp_pad, n=n, win_rows=win_rows),
        grid=(T,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((1, N), lambda t: (0, 0)),
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Lp_pad, N), lambda t: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            # (T, 1, N) keeps the per-step block tiling-legal: the last
            # two block dims (1, N) equal the array dims
            pl.BlockSpec((1, 1, N), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, N), lambda t: (0, 0)),
            pl.BlockSpec((1, 1), lambda t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 1, N), jnp.int32),
            jax.ShapeDtypeStruct((1, N), jnp.uint32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((win_rows, 128), jnp.int32),
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )(states2, off2, cum3, words2)
    return syms.reshape(T * N)[:n], states_out[0], off_out[0, 0]
