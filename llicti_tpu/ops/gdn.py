"""GDN1 activation (l1 generalized divisive normalization) as a Flax module.

y_c = x_c / (beta_c + sum_k gamma_ck * |x_k|)

Parameters are stored through compressai's non-negative parametrization:
param = sqrt(value + pedestal), value = lower_bound(param, bound)^2 - pedestal
with pedestal = eps^2, bound = sqrt(minimum + pedestal).
Reference: compressai.layers.GDN1, used via graphs/models/LLICTI_nets.py:8,
activation option :690-691.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .bounds import lower_bound


class _NonNegParam:
    def __init__(self, minimum: float = 0.0, eps: float = 2 ** -18):
        self.pedestal = eps ** 2
        self.bound = (minimum + self.pedestal) ** 0.5

    def init(self, value):
        return jnp.sqrt(jnp.maximum(value + self.pedestal, self.pedestal))

    def __call__(self, param):
        return lower_bound(param, self.bound) ** 2 - self.pedestal


class GDN1(nn.Module):
    """l1-GDN over the channel (last) axis of an NHWC tensor."""

    channels: int
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = self.channels
        beta_rep = _NonNegParam(minimum=self.beta_min)
        gamma_rep = _NonNegParam()
        beta_p = self.param("beta", lambda rng: beta_rep.init(jnp.ones((C,))))
        gamma_p = self.param(
            "gamma", lambda rng: gamma_rep.init(self.gamma_init * jnp.eye(C))
        )
        beta = beta_rep(beta_p)
        gamma = gamma_rep(gamma_p)
        norm = jnp.abs(x) @ gamma.T + beta
        return x / norm
