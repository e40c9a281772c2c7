"""Range coder round-trip property tests (random CDFs + symbols)."""
import numpy as np
import pytest

from llicti_tpu import coder


def _random_cdfs(rng, n, Lp, concentrated=False):
    """Random strictly-monotone-mod-2^16 uint16 CDF rows (coder contract)."""
    if concentrated:
        # peaky distributions (realistic for the codec)
        alphas = np.full(Lp - 1, 0.05)
        alphas[rng.integers(0, Lp - 1, size=3)] = 10.0
        p = rng.dirichlet(alphas, size=n)
    else:
        p = rng.dirichlet(np.ones(Lp - 1), size=n)
    cdf_f = np.concatenate([np.zeros((n, 1)), np.cumsum(p, axis=-1)], axis=-1)
    cdf_f = np.clip(cdf_f, 0.0, 1.0)
    cdf_f[:, -1] = 1.0
    new_max = 2 ** 16 - (Lp - 1)
    q = np.round(cdf_f * new_max).astype(np.int64) + np.arange(Lp)
    return (q % 2 ** 16).astype(np.uint16)


@pytest.mark.parametrize("Lp,n", [(257, 1000), (512, 500), (17, 4096), (2, 100)])
def test_roundtrip_random(Lp, n):
    rng = np.random.default_rng(Lp + n)
    cdf = _random_cdfs(rng, n, Lp)
    syms = rng.integers(0, Lp - 1, size=n).astype(np.int16)
    data = coder.encode_cdf(cdf, syms)
    out = coder.decode_cdf(cdf, data)
    np.testing.assert_array_equal(out, syms)


def test_roundtrip_concentrated():
    rng = np.random.default_rng(7)
    Lp, n = 257, 20000
    cdf = _random_cdfs(rng, n, Lp, concentrated=True)
    # sample symbols from each row's own distribution (likely symbols)
    u = rng.integers(0, 2 ** 16, size=n).astype(np.uint32)
    c = cdf.astype(np.int64)
    c[:, -1] = 2 ** 16
    syms = (np.sum(c[:, :-1] <= u[:, None], axis=-1) - 1).astype(np.int16)
    data = coder.encode_cdf(cdf, syms)
    out = coder.decode_cdf(cdf, data)
    np.testing.assert_array_equal(out, syms)


def test_lohi_matches_full_cdf_encode():
    rng = np.random.default_rng(3)
    Lp, n = 64, 2048
    cdf = _random_cdfs(rng, n, Lp)
    syms = rng.integers(0, Lp - 1, size=n).astype(np.int16)
    lo = cdf[np.arange(n), syms]
    hi = cdf[np.arange(n), syms + 1]
    data_a = coder.encode_cdf(cdf, syms)
    data_b = coder.encode_lohi(lo, hi)
    assert data_a == data_b


def test_extreme_symbols_and_tiny_probs():
    # every bin can be as small as 1/2^16; code first and last symbols
    rng = np.random.default_rng(4)
    Lp, n = 512, 512
    cdf = _random_cdfs(rng, n, Lp, concentrated=True)
    syms = np.zeros(n, np.int16)
    syms[::2] = Lp - 2  # alternate min/max symbols (worst case)
    data = coder.encode_cdf(cdf, syms)
    out = coder.decode_cdf(cdf, data)
    np.testing.assert_array_equal(out, syms)


def test_rate_close_to_entropy():
    # uniform over 256 symbols -> ~8 bits/symbol
    rng = np.random.default_rng(5)
    Lp, n = 257, 50000
    p = np.full((n, Lp - 1), 1.0 / (Lp - 1))
    cdf_f = np.concatenate([np.zeros((n, 1)), np.cumsum(p, -1)], -1)
    new_max = 2 ** 16 - (Lp - 1)
    cdf = ((np.round(cdf_f * new_max).astype(np.int64) + np.arange(Lp))
           % 2 ** 16).astype(np.uint16)
    syms = rng.integers(0, Lp - 1, size=n).astype(np.int16)
    data = coder.encode_cdf(cdf, syms)
    bits_per_sym = len(data) * 8 / n
    assert 7.99 < bits_per_sym < 8.05


def test_empty_and_single_symbol():
    cdf = _random_cdfs(np.random.default_rng(6), 1, 257)
    syms = np.array([100], np.int16)
    data = coder.encode_cdf(cdf, syms)
    out = coder.decode_cdf(cdf, data)
    np.testing.assert_array_equal(out, syms)


def test_shared_cdf_decode():
    rng = np.random.default_rng(8)
    Lp, n = 257, 3000
    row = _random_cdfs(rng, 1, Lp)[0]
    syms = rng.integers(0, Lp - 1, size=n).astype(np.int16)
    cdf = np.broadcast_to(row, (n, Lp)).copy()
    data = coder.encode_cdf(cdf, syms)
    out = coder.decode_shared_cdf(row, n, data)
    np.testing.assert_array_equal(out, syms)
