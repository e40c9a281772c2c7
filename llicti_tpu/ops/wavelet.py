"""Lazy wavelet transform (polyphase even/odd split) and its inverse.

The image is split per scale into four polyphase bands
x00 (even,even), x11 (odd,odd), x01 (even,odd), x10 (odd,even), concatenated
channel-wise in the order (x00, x11, x01, x10) — matching the reference
(graphs/models/LLICTI_nets.py:181-245).  Odd sizes are handled with
replicate padding of x01/x10/x11 up to x00's size, recorded as 2 bits per
scale packed into an integer for the bitstream header
(reference LLICTI_nets.py:226-240, 532-542).

Layout is NHWC.  Bands at scale ``lev`` are sliced from the *original*
image with stride 2**(lev+1) (non-recursive), exactly like the reference.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp


def _pad_edge(x: jnp.ndarray, left: int, right: int, top: int, bottom: int) -> jnp.ndarray:
    """Replicate ("edge") pad H and W of an NHWC array."""
    if left == right == top == bottom == 0:
        return x
    return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)), mode="edge")


def lazy_dwt(x: jnp.ndarray, levels: Sequence[int], pad: bool = False):
    """Polyphase decomposition.

    Args:
      x: [B, H, W, C] image.
      levels: which dyadic levels to emit (e.g. (0, 1, 2, 3, 4)).
      pad: replicate-pad odd bands to x00's size and return pad bookkeeping.

    Returns:
      y_list (list of [B, h, w, 4C] per level) and, when pad=True, also
      (pad_flags list of (padH, padW) per level, packed pad int).
    Reference: LLICTI_nets.py:181-245.
    """
    y_list = []
    pad_flags: List[Tuple[bool, bool]] = []
    pad_int = 0
    for lev in range(0, max(levels) + 1):
        if lev not in levels:
            continue
        st = 2 ** (lev + 1)
        of = st // 2
        x00 = x[:, 0::st, 0::st, :]
        x01 = x[:, 0::st, of::st, :]
        x10 = x[:, of::st, 0::st, :]
        x11 = x[:, of::st, of::st, :]
        if pad:
            padH = x00.shape[1] > x11.shape[1]
            padW = x00.shape[2] > x11.shape[2]
            pad_flags.append((padH, padW))
            pad_int = 4 * pad_int + 2 * int(padH) + int(padW)
            if padH and padW:
                x01 = _pad_edge(x01, 0, 1, 0, 0)
                x10 = _pad_edge(x10, 0, 0, 0, 1)
                x11 = _pad_edge(x11, 0, 1, 0, 1)
            elif padW:
                x01 = _pad_edge(x01, 0, 1, 0, 0)
                x11 = _pad_edge(x11, 0, 1, 0, 0)
            elif padH:
                x10 = _pad_edge(x10, 0, 0, 0, 1)
                x11 = _pad_edge(x11, 0, 0, 0, 1)
        y_list.append(jnp.concatenate((x00, x11, x01, x10), axis=-1))
    if not pad:
        return y_list
    return y_list, pad_flags, pad_int


def interleave_bands(x00, x11, x01, x10) -> jnp.ndarray:
    """Inverse polyphase interleave of one level ([B,h,w,C] x4 -> [B,2h,2w,C]).

    Reference: LLICTI_nets.py:445-454, 500-509 (scatter into strided slices);
    here expressed as reshape-stack, which XLA lowers without scatters.
    """
    B, h, w, C = x00.shape
    top = jnp.stack((x00, x01), axis=3).reshape(B, h, 2 * w, C)  # even rows
    bot = jnp.stack((x10, x11), axis=3).reshape(B, h, 2 * w, C)  # odd rows
    return jnp.stack((top, bot), axis=2).reshape(B, 2 * h, 2 * w, C)


def interleave_scale(y_lev: jnp.ndarray, c: int, crop_h: int = 0, crop_w: int = 0) -> jnp.ndarray:
    """Interleave a [B,h,w,4c] scale tensor (x00,x11,x01,x10 channel groups)
    into [B,2h-crop_h,2w-crop_w,c]."""
    x00 = y_lev[..., 0 * c:1 * c]
    x11 = y_lev[..., 1 * c:2 * c]
    x01 = y_lev[..., 2 * c:3 * c]
    x10 = y_lev[..., 3 * c:4 * c]
    out = interleave_bands(x00, x11, x01, x10)
    H, W = out.shape[1], out.shape[2]
    return out[:, : H - crop_h, : W - crop_w, :]


def unpack_pad_flags(pad_int: int, num_scales: int) -> List[Tuple[bool, bool]]:
    """Unpack 2-bit-per-scale pad flags. Reference: LLICTI_nets.py:532-542."""
    flags = []
    v = int(pad_int)
    for _ in range(num_scales):
        padW = bool(v % 2)
        v //= 2
        padH = bool(v % 2)
        v //= 2
        flags.append((padH, padW))
    flags.reverse()
    return flags


def pad_decoded_band(x: jnp.ndarray, band: int, padH: bool, padW: bool) -> jnp.ndarray:
    """Replicate-pad a decoded band back to x00's size.

    band 0 = x11, band 1 = x01, band 2 = x10 (decode order).
    Reference: LLICTI_nets.py:511-530.
    """
    if padH and padW:
        if band == 1:
            return _pad_edge(x, 0, 1, 0, 0)
        if band == 2:
            return _pad_edge(x, 0, 0, 0, 1)
        if band == 0:
            return _pad_edge(x, 0, 1, 0, 1)
    elif padW:
        if band in (0, 1):
            return _pad_edge(x, 0, 1, 0, 0)
    elif padH:
        if band in (0, 2):
            return _pad_edge(x, 0, 0, 0, 1)
    return x


def band_coded_shape(h: int, w: int, band: int, padH: bool, padW: bool) -> Tuple[int, int]:
    """Actual (uncropped-of-padding) coded size of a band given x00's (h, w).

    The encoder crops the replicate-padded row/col before entropy coding
    (reference LLICTI_nets.py:396-397): bands 0 and 2 (x11, x10) drop the
    padded row; bands 0 and 1 (x11, x01) drop the padded col.
    """
    ch = h - 1 if (padH and band in (0, 2)) else h
    cw = w - 1 if (padW and band in (0, 1)) else w
    return ch, cw
