"""Fully-factorized learned prior (lossless EntropyBottleneck analog).

The reference subclasses compressai's EntropyBottleneck with quantization
disabled (graphs/layers/entropy_layer_nets.py:12-56); it is vestigial in
the live model but part of the capability surface (SURVEY.md §2.2).  This
is the univariate monotone-MLP density of Balle et al. 2018, evaluated as
a discrete interval mass over the /255 grid.

Per channel c, the cumulative is
  c(x) = sigmoid(f_K(...f_1(x)))   with
  f_k(x) = x @ softplus(H_k) + b_k + tanh(a_k) * tanh(x @ softplus(H_k) + b_k)
which is monotone in x for any parameters.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .bounds import lower_bound

HALF = 0.5 / 255.0
LIKELIHOOD_BOUND = 1e-9


class FactorizedPrior(nn.Module):
    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        # learned per-channel (lower-tail, median, upper-tail) quantile
        # positions, pulled toward the tail_mass CDF levels by loss() —
        # the EntropyBottleneck aux/quantile machinery the reference
        # aggregates in aux_loss (LLICTI_nets.py:31-38)
        self.quantiles = self.param(
            "quantiles",
            lambda rng, sh=(self.channels, 1, 3): jnp.tile(
                jnp.array([-self.init_scale, 0.0, self.init_scale]),
                (sh[0], 1, 1)))
        self._setup_density()

    def _setup_density(self):
        C = self.channels
        dims = (1,) + self.filters + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        matrices, biases, factors = [], [], []
        for k in range(len(dims) - 1):
            init_m = jnp.log(jnp.expm1(1.0 / scale / dims[k + 1]))
            matrices.append(self.param(
                f"H{k}", lambda rng, v=init_m, sh=(C, dims[k + 1], dims[k]):
                jnp.full(sh, v)))
            biases.append(self.param(
                f"b{k}", lambda rng, sh=(C, dims[k + 1], 1):
                jax.random.uniform(rng, sh, minval=-0.5, maxval=0.5)))
            if k < len(dims) - 2:
                factors.append(self.param(
                    f"a{k}", lambda rng, sh=(C, dims[k + 1], 1):
                    jnp.zeros(sh)))
        self.matrices = matrices
        self.biases = biases
        self.factors = factors

    def _logits_cumulative(self, x, stop_density: bool = False):
        """x: [C, 1, N] -> logits [C, 1, N]."""
        sg = jax.lax.stop_gradient if stop_density else (lambda a: a)
        v = x
        K = len(self.matrices)
        for k in range(K):
            H = jax.nn.softplus(sg(self.matrices[k]))
            v = jnp.einsum("cij,cjn->cin", H, v) + sg(self.biases[k])
            if k < K - 1:
                v = v + jnp.tanh(sg(self.factors[k])) * jnp.tanh(v)
        return v

    def likelihood(self, x):
        """Discrete interval mass of x: [..., C] in the /255 domain."""
        C = self.channels
        flat = jnp.moveaxis(x.reshape(-1, C), 0, 1)[:, None, :]  # [C,1,N]
        upper = jax.nn.sigmoid(self._logits_cumulative(flat + HALF))
        lower = jax.nn.sigmoid(self._logits_cumulative(flat - HALF))
        p = (upper - lower)[:, 0, :]
        p = jnp.moveaxis(p, 0, 1).reshape(x.shape)
        return lower_bound(p, LIKELIHOOD_BOUND)

    def __call__(self, x):
        """Self-information map: -log2 p(x)."""
        return -jnp.log2(self.likelihood(x))

    def cdf_table(self, points):
        """Cumulative evaluated on a [P] grid -> [C, P] (for coding)."""
        C = self.channels
        pts = jnp.broadcast_to(points[None, None, :], (C, 1, points.shape[0]))
        return jax.nn.sigmoid(self._logits_cumulative(pts))[:, 0, :]

    def loss(self):
        """Quantile aux loss (EntropyBottleneck.loss analog): pulls the
        learned quantiles to where the cumulative hits tail_mass/2, 0.5,
        and 1-tail_mass/2.  Density params are stopped so only the
        quantiles move (they only feed range estimation, not the rate)."""
        t = jnp.log(2.0 / self.tail_mass - 1.0)
        target = jnp.array([-t, 0.0, t])
        logits = self._logits_cumulative(self.quantiles, stop_density=True)
        return jnp.sum(jnp.abs(logits - target[None, None, :]))

    def medians(self):
        """Learned per-channel median positions [C]."""
        return self.quantiles[:, 0, 1]
