"""Sharded rate-estimation for large images (context-parallel analog).

A big image's differentiable rate can be computed with H sharded over the
``spatial`` mesh axis; XLA inserts the halo exchanges for the small
layer-0 convs automatically (receptive fields <= Ev x Ev = 4x4, so halos
are <= 2 pixels per side — SURVEY.md §2.3.3).  Batches additionally shard
over ``data``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..training.loss import rate_loss_list
from .mesh import replicated


def make_sharded_rate_fn(model, mesh):
    """Returns rate(params, x) with x [B,H,W,3] sharded (data, spatial)."""
    repl = replicated(mesh)
    xsh = NamedSharding(mesh, P("data", "spatial", None, None))

    def rate(params, x):
        si_list = model.apply(params, x)
        total, breakdown = rate_loss_list(x.size, si_list)
        return total, breakdown

    fn = jax.jit(rate, in_shardings=(repl, xsh), out_shardings=(repl, repl))

    def run(params, x):
        params = jax.tree.map(lambda a: jax.device_put(a, repl), params)
        x = jax.device_put(jnp.asarray(x), xsh)
        return fn(params, x)

    return run
