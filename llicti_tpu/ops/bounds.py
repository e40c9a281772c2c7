"""Lower-bound op with compressai's straight-through-ish gradient.

Forward: max(x, bound).  Backward: the gradient passes where x >= bound, or
where the gradient is negative (i.e. the update would push x back above the
bound).  Reference: compressai.ops.LowerBound, used at
graphs/layers/entropy_layer_nets.py:9,158 and via GaussianConditional's
lower_bound_scale / likelihood_lower_bound.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x: jnp.ndarray, bound: float) -> jnp.ndarray:
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound):
    return jnp.maximum(x, bound), (x >= bound)


def _lb_bwd(res, g):
    passes = res
    pass_through = jnp.logical_or(passes, g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lb_fwd, _lb_bwd)
