"""Factorized-prior entropy model tests."""
import jax
import jax.numpy as jnp
import numpy as np

from llicti_tpu.ops.factorized import FactorizedPrior


def test_likelihood_interval_mass_consistent():
    m = FactorizedPrior(channels=2, init_scale=1.0)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((4, 2)))
    # sum of interval masses over a grid == cdf(top) - cdf(bottom)
    grid = jnp.arange(-255, 256) / 255.0
    x = jnp.stack([grid, grid], -1)
    p = m.apply(params, x, method=FactorizedPrior.likelihood)
    total = np.asarray(jnp.sum(p, axis=0))
    ends = np.asarray(m.apply(
        params, jnp.array([-255.5 / 255.0, 255.5 / 255.0]),
        method=FactorizedPrior.cdf_table))
    expected = ends[:, 1] - ends[:, 0]
    np.testing.assert_allclose(total, expected, atol=2e-3)
    assert (p >= 0).all() if isinstance(p, np.ndarray) else (
        np.asarray(p) >= 0).all()


def test_cdf_monotone():
    m = FactorizedPrior(channels=3)
    params = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 3)))
    pts = jnp.linspace(-1.5, 1.5, 101)
    cdf = np.asarray(m.apply(params, pts, method=FactorizedPrior.cdf_table))
    assert cdf.shape == (3, 101)
    assert (np.diff(cdf, axis=-1) >= -1e-7).all()


def test_self_information_trains():
    m = FactorizedPrior(channels=1)
    rng = np.random.default_rng(0)
    data = jnp.asarray(
        np.round(rng.normal(0, 10, (512, 1))) / 255.0, jnp.float32)
    params = m.init(jax.random.PRNGKey(2), data)

    def loss(p):
        return jnp.mean(m.apply(p, data))

    import optax
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    l0 = float(loss(params))
    step = jax.jit(lambda p, o: _step(p, o))

    def _step(p, o):
        l, g = jax.value_and_grad(loss)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    step = jax.jit(_step)
    for _ in range(60):
        params, opt, l = step(params, opt)
    assert float(l) < l0 - 0.3, (l0, float(l))


def test_quantile_aux_loss_converges():
    """loss() pulls the learned quantiles toward the tail_mass CDF
    levels while leaving the density weights untouched (EntropyBottleneck
    aux/quantile machinery; reference aux_loss LLICTI_nets.py:31-38)."""
    import optax

    prior = FactorizedPrior(channels=2, init_scale=10.0,
                            tail_mass=0.05)
    params = prior.init(jax.random.PRNGKey(0), jnp.zeros((4, 2)))

    def aux(params):
        return prior.apply(params, method=FactorizedPrior.loss)

    tx = optax.adam(0.5)
    opt = tx.init(params)
    l0 = float(aux(params))
    g0 = jax.grad(aux)(params)
    # density weights receive zero gradient from the aux loss
    flat = jax.tree_util.tree_flatten_with_path(g0)[0]
    for path, leaf in flat:
        name = "/".join(str(p) for p in path)
        if "quantiles" not in name:
            assert float(jnp.abs(leaf).max()) == 0.0, name
    for _ in range(300):
        g = jax.grad(aux)(params)
        upd, opt = tx.update(g, opt)
        params = optax.apply_updates(params, upd)
    l1 = float(aux(params))
    assert l1 < l0 * 0.1, (l0, l1)
    med = prior.apply(params, method=FactorizedPrior.medians)
    assert jnp.all(jnp.isfinite(med))


def test_model_aux_loss_zero_for_live_model():
    from llicti_tpu.config import ModelConfig
    from llicti_tpu.models.llicti import LLICTIModel

    cfg = ModelConfig(chs=(8, 1), evens=(4, 4), odds=(3, 3),
                      dwtlevels=(0, 1), useprevlevNN=(False, True))
    model = LLICTIModel(cfg=cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    val = model.apply(params, method=LLICTIModel.aux_loss)
    assert float(val) == 0.0
