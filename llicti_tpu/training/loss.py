"""Rate losses with per-(scale, band, color) breakdown.

Reference: graphs/losses/rate_dist.py:79-135.  Rates are "bits per
subpixel x 3" (numel counts all 3 subpixels), matching the reference's
logging convention so numbers are directly comparable.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def rate_loss_list(numel_x: int, si_list: Sequence[jnp.ndarray]):
    """Differentiable total rate + per-scale/band/color breakdown.

    Returns (total_rate scalar, breakdown [S, 9] array).  The breakdown is
    differentiable too; callers .item() it for logging (reference
    rate_dist.py:97-104 detaches via .item()).
    """
    total = 0.0
    rows = []
    for si in si_list:
        per_bc = jnp.sum(si, axis=(0, 1, 2)) / numel_x * 3  # [9]
        rows.append(per_bc)
        total = total + jnp.sum(per_bc)
    return total, jnp.stack(rows)  # [S, 9]


def rate_distortion_loss(x, x_hat, si_list, lambda_: float):
    """Legacy lossy R + lambda*D objective (reference rate_dist.py:14-58,
    kept for capability parity; the lossless path uses rate_loss_list)."""
    numel = x.size
    rate, breakdown = rate_loss_list(numel, si_list)
    mse = jnp.mean((x - x_hat) ** 2)
    return rate + lambda_ * mse, mse, rate


def compression_rate_list(numel_x: int, streams) -> np.ndarray:
    """Actual bpp breakdown from bytestream lengths (incl. header row).

    Reference: rate_dist.py:125-135.  Returns [S+1, 9]; row 0 is the
    header group.
    """
    rows = []
    for group in streams:
        rows.append([len(s) * 8 / numel_x * 3 for s in group])
    return np.asarray(rows)
