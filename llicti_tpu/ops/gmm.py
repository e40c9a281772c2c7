"""Discrete Gaussian-mixture probability model for lossless coding.

The data lives in the /255 domain; a pixel value v is modeled as the
probability mass of the interval [v - 0.5/255, v + 0.5/255] under a
Gaussian (or logistic) mixture:

  p(v) = sum_x w_x * [ Phi((h - |v - mu_x|)/s_x) - Phi((-h - |v - mu_x|)/s_x) ]

with h = 0.5/255 (reference: graphs/layers/entropy_layer_nets.py:121-139,
160-183).  Scales are lower-bounded at 0.11/255, mixture weights at 1e-6
then renormalized (NOT softmax — reference :158,:178-179), and the final
likelihood at 1e-9 (compressai EntropyModel default likelihood_bound).

CDF tables for the arithmetic coder are evaluated on sampling grids with
widened tail endpoints and converted to the uint16 fixed-point contract
(reference: LLICTI_nets.py:604-610, 938-983).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc

from .bounds import lower_bound

HALF = 0.5 / 255.0
SCALE_BOUND_NORMAL = 0.11 / 255.0
SCALE_BOUND_LOGISTIC = 0.04
WEIGHT_BOUND = 1e-6
LIKELIHOOD_BOUND = 1e-9
_SQRT2_INV = 2 ** -0.5


def standardized_cumulative(x: jnp.ndarray) -> jnp.ndarray:
    """Standard normal CDF as 0.5*erfc(-x/sqrt(2)) (compressai's form)."""
    return 0.5 * erfc(-_SQRT2_INV * x)


def _mix_likelihood(values, scales, weights, num_mix: int, *, logistic: bool = False):
    """Shared mixture-weighted interval mass.

    values: [..., M, X] (already y - mu), scales/weights: [..., M, X].
    Returns [..., M].
    """
    if logistic:
        scales = lower_bound(scales, SCALE_BOUND_LOGISTIC)
        upper = jax.nn.sigmoid((values + HALF) / scales)
        lower = jax.nn.sigmoid((values - HALF) / scales)
    else:
        scales = lower_bound(scales, SCALE_BOUND_NORMAL)
        values = jnp.abs(values)
        upper = standardized_cumulative((HALF - values) / scales)
        lower = standardized_cumulative((-HALF - values) / scales)
    p_mix = upper - lower
    w = lower_bound(weights, WEIGHT_BOUND)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.sum(w * p_mix, axis=-1)


def gmm_self_information(
    y: jnp.ndarray,
    scales: jnp.ndarray,
    means: jnp.ndarray,
    weights: jnp.ndarray,
    num_mix: int,
    *,
    logistic: bool = False,
) -> jnp.ndarray:
    """-log2 p(y) under the discrete mixture.

    y: [..., M]; scales/means/weights: [..., M*X] in m-major layout
    (channel m occupies slots [m*X:(m+1)*X]), matching the reference's
    param channel layout (entropy_layer_nets.py:174-180).
    """
    M = y.shape[-1]
    X = num_mix
    shape = y.shape[:-1] + (M, X)
    values = y[..., :, None] - means.reshape(shape)
    p = _mix_likelihood(values, scales.reshape(shape), weights.reshape(shape), X,
                        logistic=logistic)
    p = lower_bound(p, LIKELIHOOD_BOUND)
    return -jnp.log2(p)


def cdf_sampling_points(min_val: int, max_val: int, tail: float = 20.0) -> jnp.ndarray:
    """Sampling grid for one color channel's CDF table.

    Points at (k - 0.5)/255 for k in [min_val, max_val + 1], with the two
    endpoints pushed out by ``tail``/255 to capture the tail mass
    (reference: LLICTI_nets.py:940-942).
    """
    n = max_val - min_val + 2
    pts = jnp.linspace(min_val - 0.5, max_val + 0.5, n) / 255.0
    pts = pts.at[0].set((min_val - 0.5 - tail) / 255.0)
    pts = pts.at[-1].set((max_val + 0.5 + tail) / 255.0)
    return pts


def gmm_cdf_table(
    points: jnp.ndarray,
    scales: jnp.ndarray,
    means: jnp.ndarray,
    weights: jnp.ndarray,
    *,
    logistic: bool = False,
) -> jnp.ndarray:
    """Float mixture CDF evaluated on ``points`` for every pixel.

    points: [P]; scales/means/weights: [..., X] (single color channel, X
    mixtures).  Returns [..., P].  Reference:
    entropy_layer_nets.py:185-204 (note the 1e-9 guard in the weight
    normalization, which differs from the training path).  The logistic
    variant (sigmoid CDF, scale bound 0.04 — entropy_layer_nets.py:234-282)
    extends the codec beyond the reference, whose coding path is
    normal-only.
    """
    scales = lower_bound(
        scales, SCALE_BOUND_LOGISTIC if logistic else SCALE_BOUND_NORMAL)
    w = lower_bound(weights, WEIGHT_BOUND)
    w = w / (1e-9 + jnp.sum(w, axis=-1, keepdims=True))
    # [..., X, P]
    z = (points - means[..., None]) / scales[..., None]
    cdf_mix = jax.nn.sigmoid(z) if logistic else standardized_cumulative(z)
    return jnp.sum(w[..., None] * cdf_mix, axis=-2)


def cdf_float_to_uint16(cdf: jnp.ndarray) -> jnp.ndarray:
    """Quantize a float CDF in [0, 1] to the coder's uint16 contract.

    cdf[..., P] -> round(cdf * (2^16 - (P-1))) + arange(P), mod 2^16.
    Strictly monotone; the final entry wraps to 0 and is interpreted as
    2^16 by the coder.  Mirrors torchac's required input format
    (reference: LLICTI_nets.py:955-983).
    """
    P = cdf.shape[-1]
    new_max = 2 ** 16 - (P - 1)
    q = jnp.round(jnp.clip(cdf, 0.0, 1.0) * new_max).astype(jnp.int32)
    # guard against 1-ulp non-monotonicity of the f32 erfc approximation:
    # a decreasing step would give a zero-width coder interval.
    q = jax.lax.cummax(q, axis=q.ndim - 1)
    q = q + jnp.arange(P, dtype=jnp.int32)
    return q.astype(jnp.uint16)
