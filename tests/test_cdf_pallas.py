"""Pallas CDF kernel tests (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from llicti_tpu.coder.rans_device import cdf_float_to_cum_int32
from llicti_tpu.ops.cdf_pallas import _phi, gmm_cdf_table_int32_pallas
from llicti_tpu.ops.gmm import cdf_sampling_points, gmm_cdf_table


def test_phi_approximation_accuracy():
    z = jnp.linspace(-6, 6, 201)
    got = np.asarray(_phi(z))
    ref = stats.norm.cdf(np.asarray(z))
    assert np.abs(got - ref).max() < 2e-7


def test_kernel_matches_xla_reference():
    rng = np.random.default_rng(0)
    X = 5
    shape = (1, 6, 9, X)
    stdevs = jnp.asarray(rng.uniform(0.002, 0.2, shape).astype(np.float32))
    means = jnp.asarray(rng.uniform(-0.4, 0.4, shape).astype(np.float32))
    weights = jnp.asarray(rng.uniform(0.05, 1.0, shape).astype(np.float32))
    pts = cdf_sampling_points(-127, 128)

    ref = np.asarray(cdf_float_to_cum_int32(
        gmm_cdf_table(pts, stdevs, means, weights)))
    got = np.asarray(gmm_cdf_table_int32_pallas(pts, stdevs, means, weights,
                                                64))
    assert got.shape == ref.shape
    # same contract
    assert (got[..., -1] == 2 ** 16).all()
    assert (np.diff(got, axis=-1) >= 1).all()
    # erf approximation differs from exact erfc by <=1 quantization step
    assert np.abs(got.astype(np.int64) - ref.astype(np.int64)).max() <= 2


def test_kernel_roundtrip_with_rans():
    from llicti_tpu.coder.rans_device import (RansRefDecoder, RansRefEncoder)

    rng = np.random.default_rng(1)
    X, n = 5, 64
    stdevs = jnp.asarray(rng.uniform(0.002, 0.1, (n, X)).astype(np.float32))
    means = jnp.asarray(rng.uniform(-0.3, 0.3, (n, X)).astype(np.float32))
    weights = jnp.asarray(rng.uniform(0.05, 1.0, (n, X)).astype(np.float32))
    pts = cdf_sampling_points(-127, 128)
    cum = np.asarray(gmm_cdf_table_int32_pallas(pts, stdevs, means, weights,
                                                64))
    u = rng.integers(0, 2 ** 16, size=n)
    syms = (np.sum(cum[:, :-1] <= u[:, None], -1) - 1).astype(np.int32)
    enc = RansRefEncoder(4)
    starts = cum[np.arange(n), syms]
    freqs = cum[np.arange(n), syms + 1] - starts
    enc.encode_slice(starts, freqs)
    words, states = enc.finish()
    out = RansRefDecoder(words, states).decode_slice(cum)
    np.testing.assert_array_equal(out, syms)
