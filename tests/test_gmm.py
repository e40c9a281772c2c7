"""GMM likelihood / CDF golden tests against hand-computed values."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from llicti_tpu.ops.bounds import lower_bound
from llicti_tpu.ops.gmm import (
    HALF,
    cdf_float_to_uint16,
    cdf_sampling_points,
    gmm_cdf_table,
    gmm_self_information,
    standardized_cumulative,
)


def test_standardized_cumulative_matches_scipy():
    x = np.linspace(-8, 8, 101).astype(np.float32)
    got = np.asarray(standardized_cumulative(jnp.asarray(x)))
    np.testing.assert_allclose(got, stats.norm.cdf(x), atol=1e-6)


def test_single_component_likelihood():
    # one pixel, M=1 channel, X=2 mixtures with all weight on component 0
    y = jnp.array([[10.0 / 255.0]])
    means = jnp.array([[10.0 / 255.0, 0.0]])
    scales = jnp.array([[2.0 / 255.0, 1.0]])
    weights = jnp.array([[1.0, 1e-12]])  # second weight below bound -> 1e-6
    si = gmm_self_information(y, scales, means, weights, num_mix=2)
    # expected: w normalized over lower-bounded weights
    w0, w1 = 1.0, 1e-6
    w0, w1 = w0 / (w0 + w1), w1 / (w0 + w1)
    p0 = stats.norm.cdf(0.5 / 2.0) - stats.norm.cdf(-0.5 / 2.0)
    v1 = 10.0 / 255.0
    p1 = stats.norm.cdf((HALF - v1) / 1.0) - stats.norm.cdf((-HALF - v1) / 1.0)
    expected = -np.log2(w0 * p0 + w1 * p1)
    # f32 erfc on device vs f64 scipy: allow 1e-4 relative
    np.testing.assert_allclose(np.asarray(si)[0, 0], expected, rtol=1e-4)


def test_scale_lower_bound_applied():
    y = jnp.array([[0.0]])
    means = jnp.array([[0.0]])
    tiny = jnp.array([[1e-9]])
    weights = jnp.array([[1.0]])
    si_tiny = gmm_self_information(y, tiny, means, weights, num_mix=1)
    si_bound = gmm_self_information(
        y, jnp.array([[0.11 / 255.0]]), means, weights, num_mix=1
    )
    np.testing.assert_allclose(np.asarray(si_tiny), np.asarray(si_bound), rtol=1e-6)


def test_likelihood_lower_bound_keeps_si_finite():
    y = jnp.array([[200.0 / 255.0]])
    means = jnp.array([[0.0]])
    scales = jnp.array([[0.11 / 255.0]])
    weights = jnp.array([[1.0]])
    si = gmm_self_information(y, scales, means, weights, num_mix=1)
    assert np.isfinite(np.asarray(si)).all()
    np.testing.assert_allclose(np.asarray(si)[0, 0], -np.log2(1e-9), rtol=1e-5)


def test_cdf_sampling_points_y_channel():
    pts = np.asarray(cdf_sampling_points(-127, 128))
    assert pts.shape == (257,)
    np.testing.assert_allclose(pts[0], -147.5 / 255.0)
    np.testing.assert_allclose(pts[-1], 148.5 / 255.0)
    np.testing.assert_allclose(pts[1], -126.5 / 255.0, atol=1e-6)


def test_cdf_table_monotone_and_normalized():
    rng = np.random.default_rng(0)
    X = 5
    shape = (2, 4, 4, X)
    scales = jnp.asarray(rng.uniform(0.001, 0.1, shape).astype(np.float32))
    means = jnp.asarray(rng.uniform(-0.3, 0.3, shape).astype(np.float32))
    weights = jnp.asarray(rng.uniform(0.1, 1.0, shape).astype(np.float32))
    pts = cdf_sampling_points(-127, 128)
    cdf = np.asarray(gmm_cdf_table(pts, scales, means, weights))
    assert cdf.shape == (2, 4, 4, 257)
    assert (np.diff(cdf, axis=-1) >= -1e-6).all()
    assert (cdf >= -1e-6).all() and (cdf <= 1.0 + 1e-6).all()


def test_uint16_conversion_contract():
    # contract: round(cdf*(2^16-(P-1))) + arange(P), mod 2^16
    cdf = jnp.asarray(np.array([[0.0, 0.25, 0.5, 1.0]], dtype=np.float32))
    out = np.asarray(cdf_float_to_uint16(cdf)).astype(np.uint32)
    P = 4
    new_max = 2 ** 16 - (P - 1)
    expected = (np.round(np.array([0.0, 0.25, 0.5, 1.0]) * new_max) +
                np.arange(P)) % 2 ** 16
    np.testing.assert_array_equal(out[0], expected.astype(np.uint32))
    # final entry wraps to 0 (interpreted as 2^16 by the coder)
    assert out[0, -1] == 0


def test_uint16_strictly_monotone_mod():
    rng = np.random.default_rng(1)
    f = np.sort(rng.uniform(0, 1, size=(8, 257)).astype(np.float32), axis=-1)
    f[:, 0] = 0.0
    f[:, -1] = 1.0
    q = np.asarray(cdf_float_to_uint16(jnp.asarray(f))).astype(np.int64)
    q[:, -1] = 2 ** 16  # wrap-interpretation
    assert (np.diff(q, axis=-1) >= 1).all()


def test_lower_bound_gradients():
    g = jax.grad(lambda x: lower_bound(x, 1.0))
    assert g(2.0) == 1.0  # above bound: pass
    assert g(0.5) == 0.0  # below bound, positive grad: blocked
    g2 = jax.grad(lambda x: -lower_bound(x, 1.0))
    assert g2(0.5) == -1.0  # below bound, negative grad: pass
