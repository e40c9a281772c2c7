"""Pallas rANS decoder vs the numpy golden model (interpret mode)."""
import jax.numpy as jnp
import numpy as np
import pytest

from llicti_tpu.coder.rans_device import (
    RansRefEncoder,
    cdf_float_to_cum_int32,
)
from llicti_tpu.coder.rans_pallas import rans_decode_pallas


def random_case(rng, n, Lp, N):
    """Random per-symbol cum tables + symbols; encode with the golden
    encoder; return everything the decoder needs."""
    cdf = np.sort(rng.uniform(0, 1, (n, Lp)), axis=-1)
    cdf[:, 0] = 0.0
    cdf[:, -1] = 1.0
    cum = np.asarray(cdf_float_to_cum_int32(jnp.asarray(cdf, jnp.float32)))
    syms = rng.integers(0, Lp - 1, n)
    starts = cum[np.arange(n), syms]
    freqs = cum[np.arange(n), syms + 1] - starts
    enc = RansRefEncoder(N)
    enc.encode_slice(starts, freqs)
    words, states = enc.finish()
    return cum, syms, words, states


@pytest.mark.parametrize("n,Lp,N", [(300, 17, 128), (1000, 33, 128),
                                    (513, 9, 256)])
def test_pallas_decode_matches_golden(n, Lp, N):
    rng = np.random.default_rng(n)
    cum, syms, words, states = random_case(rng, n, Lp, N)
    got, st, off = rans_decode_pallas(
        jnp.asarray(cum), jnp.asarray(words.astype(np.int32)),
        jnp.asarray(states, jnp.uint32), jnp.int32(0), N, n)
    assert np.array_equal(np.asarray(got), syms)
    assert int(off) == len(words)


def test_pallas_decode_chained_slices():
    """Two slices sharing lane states/stream, like the codec chain."""
    rng = np.random.default_rng(7)
    N = 128
    cases = [None, None]
    enc = RansRefEncoder(N)
    data = []
    for i, (n, Lp) in enumerate([(400, 21), (250, 13)]):
        cdf = np.sort(rng.uniform(0, 1, (n, Lp)), axis=-1)
        cdf[:, 0] = 0.0
        cdf[:, -1] = 1.0
        cum = np.asarray(cdf_float_to_cum_int32(jnp.asarray(cdf, jnp.float32)))
        syms = rng.integers(0, Lp - 1, n)
        data.append((cum, syms, n))
    # encode in reverse decode order
    for cum, syms, n in reversed(data):
        starts = cum[np.arange(n), syms]
        freqs = cum[np.arange(n), syms + 1] - starts
        enc.encode_slice(starts, freqs)
    words, states = enc.finish()
    st = jnp.asarray(states, jnp.uint32)
    off = jnp.int32(0)
    w = jnp.asarray(words.astype(np.int32))
    for cum, syms, n in data:
        got, st, off = rans_decode_pallas(jnp.asarray(cum), w, st, off,
                                          128, n)
        assert np.array_equal(np.asarray(got), syms)
