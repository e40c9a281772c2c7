"""Codec edge cases: minimal sizes, extreme color ranges, coder stress."""
import jax.numpy as jnp
import numpy as np
import pytest

from llicti_tpu.codec import Codec
from llicti_tpu.coder.rans_device import (
    RansRefDecoder,
    RansRefEncoder,
    rans_decode_slice,
)

from test_codec_roundtrip import make_codec, natural_image, small_cfg


def test_roundtrip_minimal_image():
    """Smallest codable size for 2 scales: coarsest band 2x2."""
    cfg = small_cfg()
    codec = make_codec(cfg)
    img = natural_image(8, 8, seed=1)
    out = codec.decompress(codec.compress(img))
    assert np.array_equal(out[0], img)


def test_roundtrip_flat_image():
    """Constant image: Co/Cg ranges collapse to one bucket."""
    cfg = small_cfg()
    codec = make_codec(cfg)
    img = np.full((16, 16, 3), 200, np.uint8)
    streams = codec.compress(img)
    out = codec.decompress(streams)
    assert np.array_equal(out[0], img)
    # a flat image should compress to a tiny stream (mostly header+states)
    assert Codec.num_bytes(streams) < 1200


def test_roundtrip_extreme_colors():
    """Saturated primaries push Co/Cg to their full [-255,255] ranges."""
    cfg = small_cfg()
    codec = make_codec(cfg)
    rng = np.random.default_rng(0)
    img = rng.choice(
        np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                  [255, 255, 0], [0, 0, 0], [255, 255, 255]], np.uint8),
        size=(16, 16), axis=0).reshape(16, 16, 3)
    out = codec.decompress(codec.compress(img))
    assert np.array_equal(out[0], img)


def test_rans_freq_one_stress():
    """Every symbol with freq==1 (max renormalization pressure): one
    word emitted per symbol, decoder must consume them all."""
    rng = np.random.default_rng(5)
    n, Lp, N = 2000, 9, 16
    # cum table with all-equal tiny freqs except a big last bin
    cum = np.zeros((n, Lp), np.int64)
    for j in range(Lp):
        cum[:, j] = j  # freq 1 for bins 0..Lp-3
    cum[:, -1] = 1 << 16
    syms = rng.integers(0, Lp - 2, n)  # always freq-1 symbols
    starts = cum[np.arange(n), syms]
    freqs = cum[np.arange(n), syms + 1] - starts
    assert (freqs == 1).all()
    enc = RansRefEncoder(N)
    enc.encode_slice(starts, freqs)
    words, states = enc.finish()
    # ~16 bits/symbol expected
    assert len(words) >= n - N
    got, _st, off = rans_decode_slice(
        jnp.asarray(cum.astype(np.int32)),
        jnp.asarray(words.astype(np.int32)),
        jnp.asarray(states, jnp.uint32), jnp.int32(0), N, n)
    assert np.array_equal(np.asarray(got), syms)
    assert int(off) == len(words)
    # cross-check the numpy decoder too
    dec = RansRefDecoder(words, states)
    assert np.array_equal(dec.decode_slice(cum), syms)


def test_size_bucket_bounds_compiled_shapes():
    """Pad-to-bucket strategy (SURVEY §7 hard part #4): a ragged set of
    odd sizes compiles a bounded number of shape program-families while
    staying lossless; the header records the original size for the crop."""
    cfg = small_cfg()
    codec = make_codec(cfg)
    codec.size_bucket = 16  # multiple of 2**(max level+1) = 4
    shapes = [(17, 23), (19, 21), (23, 17), (30, 26),
              (33, 39), (37, 47), (41, 33), (47, 44)]
    for i, (h, w) in enumerate(shapes):
        img = natural_image(h, w, seed=100 + i)
        out = codec.decompress(codec.compress(img))
        assert out.shape == (1, h, w, 3)
        assert np.array_equal(out[0], img)
    # 8 distinct input shapes -> at most 2 bucketed shapes (32x32, 48x48)
    assert len(codec.compiled_shapes) <= 2, codec.compiled_shapes
