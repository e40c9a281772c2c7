"""Device rANS coder tests: numpy golden model, jitted equivalence,
multi-slice chaining, rate sanity."""
import jax.numpy as jnp
import numpy as np
import pytest

from llicti_tpu.coder.rans_device import (
    RansRefDecoder,
    RansRefEncoder,
    cdf_float_to_cum_int32,
    pack_stream,
    rans_decode_slice,
    rans_encode_slice,
    unpack_stream,
)


def make_cum(rng, n, Lp, concentrated=True):
    """Random [n, Lp] int32 cum tables obeying the device contract."""
    if concentrated:
        alphas = np.full(Lp - 1, 0.03)
        alphas[rng.integers(0, Lp - 1, size=2)] = 8.0
        p = rng.dirichlet(alphas, size=n)
    else:
        p = rng.dirichlet(np.ones(Lp - 1), size=n)
    cdf = np.concatenate([np.zeros((n, 1)), np.cumsum(p, -1)], -1)
    return np.asarray(cdf_float_to_cum_int32(jnp.asarray(
        cdf.astype(np.float32))))


def sample_syms(rng, cum):
    n, Lp = cum.shape
    u = rng.integers(0, 2 ** 16, size=n)
    return (np.sum(cum[:, :-1] <= u[:, None], axis=-1) - 1).astype(np.int32)


def test_cum_contract():
    rng = np.random.default_rng(0)
    cum = make_cum(rng, 16, 257)
    assert (cum[:, 0] == 0).all()
    assert (cum[:, -1] == 2 ** 16).all()
    assert (np.diff(cum, axis=-1) >= 1).all()


def test_numpy_roundtrip_single_slice():
    rng = np.random.default_rng(1)
    N, n, Lp = 8, 1000, 257
    cum = make_cum(rng, n, Lp)
    syms = sample_syms(rng, cum)
    enc = RansRefEncoder(N)
    starts = cum[np.arange(n), syms]
    freqs = cum[np.arange(n), syms + 1] - starts
    enc.encode_slice(starts, freqs)
    words, states = enc.finish()
    dec = RansRefDecoder(words, states)
    out = dec.decode_slice(cum)
    np.testing.assert_array_equal(out, syms)


def test_numpy_roundtrip_chained_slices():
    rng = np.random.default_rng(2)
    N = 4
    slices = []
    for n, Lp in [(333, 257), (100, 65), (517, 512)]:
        cum = make_cum(rng, n, Lp)
        syms = sample_syms(rng, cum)
        slices.append((cum, syms))
    enc = RansRefEncoder(N)
    for cum, syms in reversed(slices):  # encode in reverse decode order
        n = len(syms)
        starts = cum[np.arange(n), syms]
        freqs = cum[np.arange(n), syms + 1] - starts
        enc.encode_slice(starts, freqs)
    words, states = enc.finish()
    dec = RansRefDecoder(words, states)
    for cum, syms in slices:
        out = dec.decode_slice(cum)
        np.testing.assert_array_equal(out, syms)


@pytest.mark.parametrize("N,n,Lp", [(8, 1000, 257), (16, 230, 64),
                                    (4, 17, 512), (32, 4096, 257)])
def test_jit_encode_matches_numpy(N, n, Lp):
    rng = np.random.default_rng(N + n)
    cum = make_cum(rng, n, Lp)
    syms = sample_syms(rng, cum)
    starts = cum[np.arange(n), syms]
    freqs = cum[np.arange(n), syms + 1] - starts

    ref = RansRefEncoder(N)
    ref.encode_slice(starts, freqs)
    ref_words_rev = np.array(ref.words, np.int32)  # reversed order
    ref_states = ref.states.astype(np.uint32)

    states0 = jnp.full(N, 1 << 16, jnp.uint32)
    buf0 = jnp.zeros(n + N, jnp.int32)
    buf, count, states = rans_encode_slice(
        jnp.asarray(starts, jnp.int32), jnp.asarray(freqs, jnp.int32),
        states0, jnp.int32(0), buf0, N)
    count = int(count)
    np.testing.assert_array_equal(np.asarray(buf)[:count], ref_words_rev)
    np.testing.assert_array_equal(np.asarray(states), ref_states)


@pytest.mark.parametrize("N,n,Lp", [(8, 1000, 257), (16, 230, 64),
                                    (4, 17, 512), (32, 4096, 257)])
def test_jit_roundtrip(N, n, Lp):
    rng = np.random.default_rng(100 + N + n)
    cum = make_cum(rng, n, Lp)
    syms = sample_syms(rng, cum)
    starts = cum[np.arange(n), syms]
    freqs = cum[np.arange(n), syms + 1] - starts

    states0 = jnp.full(N, 1 << 16, jnp.uint32)
    buf0 = jnp.zeros(n + N, jnp.int32)
    buf, count, states = rans_encode_slice(
        jnp.asarray(starts, jnp.int32), jnp.asarray(freqs, jnp.int32),
        states0, jnp.int32(0), buf0, N)
    blob = pack_stream([np.asarray(buf)[: int(count)]], np.asarray(states))
    st, words = unpack_stream(blob, N)
    syms_out, st2, off = rans_decode_slice(
        jnp.asarray(cum), jnp.asarray(words),
        jnp.asarray(st, jnp.uint32), jnp.int32(0), N, n)
    np.testing.assert_array_equal(np.asarray(syms_out), syms)
    assert int(off) == len(words)


def test_jit_chained_slices_roundtrip():
    rng = np.random.default_rng(7)
    N = 16
    slices = []
    for n, Lp in [(513, 257), (222, 512), (64, 33), (1000, 257)]:
        cum = make_cum(rng, n, Lp)
        syms = sample_syms(rng, cum)
        slices.append((cum, syms))

    states = jnp.full(N, 1 << 16, jnp.uint32)
    total_cap = sum(len(s_) for _, s_ in slices) + 4 * N
    buf = jnp.zeros(total_cap, jnp.int32)
    cursor = jnp.int32(0)
    for cum, syms in reversed(slices):
        n = len(syms)
        starts = cum[np.arange(n), syms]
        freqs = cum[np.arange(n), syms + 1] - starts
        buf, cursor, states = rans_encode_slice(
            jnp.asarray(starts, jnp.int32), jnp.asarray(freqs, jnp.int32),
            states, cursor, buf, N)
    from llicti_tpu.coder.rans_device import pack_stream_packed
    blob = pack_stream_packed(np.asarray(buf)[: int(cursor)],
                              np.asarray(states))

    st, words = unpack_stream(blob, N)
    st = jnp.asarray(st, jnp.uint32)
    off = jnp.int32(0)
    for cum, syms in slices:
        out, st, off = rans_decode_slice(
            jnp.asarray(cum), jnp.asarray(words), st, off, N, len(syms))
        np.testing.assert_array_equal(np.asarray(out), syms)


def test_rate_near_entropy():
    rng = np.random.default_rng(9)
    N, n, Lp = 16, 30000, 257
    cum = make_cum(rng, n, Lp, concentrated=False)
    syms = sample_syms(rng, cum)
    starts = cum[np.arange(n), syms]
    freqs = (cum[np.arange(n), syms + 1] - starts).astype(np.int64)
    entropy_bits = np.sum(-np.log2(freqs / 2 ** 16))
    states0 = jnp.full(N, 1 << 16, jnp.uint32)
    buf0 = jnp.zeros(n + N, jnp.int32)
    buf, count, states = rans_encode_slice(
        jnp.asarray(starts, jnp.int32), jnp.asarray(freqs, jnp.int32),
        states0, jnp.int32(0), buf0, N)
    blob = pack_stream([np.asarray(buf)[: int(count)]], np.asarray(states))
    total_bits = len(blob) * 8
    # within 1% + lane-flush overhead of the information content
    assert total_bits < entropy_bits * 1.01 + N * 32 + 64, (
        total_bits, entropy_bits)
