"""Model construction/shape/parameter-count tests.

The reference paper model (configs/llicti_A.json: 5 scales sharing one
model, chs=88, M=5, conv_layers=3) has 0.750 MB of fp32 params (~196K)
per its experiment log — we must match that count exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llicti_tpu.config import ModelConfig
from llicti_tpu.models.llicti import LLICTIModel


def _n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def paper_config(**kw):
    return ModelConfig(**kw)


def test_paper_model_param_count():
    cfg = paper_config()
    model = LLICTIModel(cfg=cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    n = _n_params(params)
    # exact reference count: layer-0 convs 17248+26048+43296 plus 3 trunk
    # stacks of 36668 = 196596 fp32 params = 0.74996 MB, which the reference
    # log prints as "0.750MB" (agents/llicti_agent.py:167-192)
    assert n == 196596, f"param count {n} != 196596"


def test_forward_shapes_and_finite():
    cfg = paper_config(chs=(16, 1, 1, 1, 1))
    model = LLICTIModel(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)
    si_list = model.apply(params, x)
    assert len(si_list) == 5
    assert si_list[0].shape == (2, 32, 32, 9)
    assert si_list[4].shape == (2, 2, 2, 9)
    for si in si_list:
        s = np.asarray(si)
        assert np.isfinite(s).all()
        assert (s >= 0).all() or s.min() > -1e-3  # self-infos nonneg-ish


def test_two_scale_config_unshared():
    cfg = paper_config(
        chs=(12, 12), evens=(4, 4), odds=(3, 3), dwtlevels=(0, 1),
        useprevlevNN=(False, False),
    )
    model = LLICTIModel(cfg=cfg)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    si_list = model.apply(params, x)
    assert len(si_list) == 2
    # two unshared models => roughly twice the params of one
    assert cfg.num_models == 2


def test_combine_layers_single_net_per_scale():
    cfg = paper_config(
        chs=(12, 12), evens=(4, 4), odds=(3, 3), dwtlevels=(0, 1),
        useprevlevNN=(False, True), combine_layers1toL=True,
    )
    model = LLICTIModel(cfg=cfg)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    si_list = model.apply(params, x)
    assert si_list[0].shape == (1, 16, 16, 9)


@pytest.mark.parametrize("activ", ["LeakyReLU", "PReLU", "GDN1", "Identity"])
def test_activations_build(activ):
    cfg = paper_config(chs=(8, 1), dwtlevels=(0, 1), useprevlevNN=(False, True),
                       evens=(4, 4), odds=(3, 3), activfun=activ)
    model = LLICTIModel(cfg=cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    si_list = model.apply(params, x)
    assert np.isfinite(np.asarray(si_list[0])).all()


def test_clrjnt0_mode():
    cfg = paper_config(chs=(8, 1), dwtlevels=(0, 1), useprevlevNN=(False, True),
                       evens=(4, 4), odds=(3, 3), clr_joint_mode=0)
    model = LLICTIModel(cfg=cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    si_list = model.apply(params, x)
    assert si_list[0].shape == (1, 8, 8, 9)


def test_clrjnt1_mode():
    cfg = paper_config(chs=(8, 1), dwtlevels=(0, 1), useprevlevNN=(False, True),
                       evens=(4, 4), odds=(3, 3), clr_joint_mode=1)
    model = LLICTIModel(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(4).uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)
    si_list = model.apply(params, x)
    # 3 bands x (1 Y si + 2 CoCg si) = 9 channels, zero channel dropped
    assert si_list[0].shape == (1, 8, 8, 9)
    assert np.isfinite(np.asarray(si_list[0])).all()


def test_logistic_distribution():
    cfg = paper_config(chs=(8, 1), dwtlevels=(0, 1), useprevlevNN=(False, True),
                       evens=(4, 4), odds=(3, 3), distribution="logistic")
    model = LLICTIModel(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)
    si_list = model.apply(params, x)
    assert np.isfinite(np.asarray(si_list[0])).all()


def test_gradients_flow():
    cfg = paper_config(chs=(8, 1), dwtlevels=(0, 1), useprevlevNN=(False, True),
                       evens=(4, 4), odds=(3, 3))
    model = LLICTIModel(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        si = model.apply(p, x)
        return sum(jnp.sum(s) for s in si) / x.size * 3

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_subtract_mean_variant_trains():
    """DC-removal variant (reference's subtract_mean knob is dead code
    there — LLICTI_nets.py:817 calls a method that no longer exists; our
    re-design actually runs): forward + grads finite, rate reasonable."""
    cfg = ModelConfig(chs=(8, 1), evens=(4, 4), odds=(3, 3),
                      dwtlevels=(0, 1), useprevlevNN=(False, True),
                      subtract_mean=True)
    model = LLICTIModel(cfg=cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        si = model.apply(p, x)
        return sum(jnp.sum(s) for s in si) / x.size / 3

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    # codec path refuses subtract_mean (as the reference's get_params does)
    from llicti_tpu.codec import Codec

    with pytest.raises(AssertionError):
        Codec(cfg, params)
