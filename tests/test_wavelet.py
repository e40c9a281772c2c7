"""Lazy DWT / inverse tests, including odd-size pad bookkeeping."""
import jax.numpy as jnp
import numpy as np

from llicti_tpu.ops.wavelet import (
    band_coded_shape,
    interleave_scale,
    lazy_dwt,
    pad_decoded_band,
    unpack_pad_flags,
)


def _img(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))


def test_bands_partition_even():
    x = _img(16, 16)
    (y0,) = lazy_dwt(x, (0,))
    assert y0.shape == (1, 8, 8, 12)
    x00 = y0[..., 0:3]
    x11 = y0[..., 3:6]
    x01 = y0[..., 6:9]
    x10 = y0[..., 9:12]
    np.testing.assert_array_equal(np.asarray(x00), np.asarray(x[:, 0::2, 0::2, :]))
    np.testing.assert_array_equal(np.asarray(x11), np.asarray(x[:, 1::2, 1::2, :]))
    np.testing.assert_array_equal(np.asarray(x01), np.asarray(x[:, 0::2, 1::2, :]))
    np.testing.assert_array_equal(np.asarray(x10), np.asarray(x[:, 1::2, 0::2, :]))


def test_interleave_inverts_split():
    x = _img(32, 64)
    (y0,) = lazy_dwt(x, (0,))
    back = interleave_scale(y0, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_multiscale_shapes():
    x = _img(64, 64)
    ys = lazy_dwt(x, (0, 1, 2))
    assert [y.shape[1] for y in ys] == [32, 16, 8]
    # scale s x00 band == original subsampled by 2^(s+1)
    np.testing.assert_array_equal(
        np.asarray(ys[2][..., 0:3]), np.asarray(x[:, 0::8, 0::8, :])
    )


def test_odd_size_padding_and_flags():
    x = _img(17, 19)
    ys, flags, pad_int = lazy_dwt(x, (0, 1), pad=True)
    # level 0: x00 is 9x10, x11 is 8x9 -> padH & padW
    assert flags[0] == (True, True)
    assert ys[0].shape == (1, 9, 10, 12)
    # level 1 (stride 4): x00 is 5x5 (rows 0,4,8,12,16 / cols 0,4,8,12,16),
    # x11 is 4x5 (rows 2,6,10,14 / cols 2,6,10,14,18) -> pad H only
    assert flags[1] == (True, False)
    assert ys[1].shape == (1, 5, 5, 12)
    # flags round-trip through the packed int
    assert unpack_pad_flags(pad_int, 2) == flags


def test_pad_flags_packing_order():
    # pad_int packs level-0 first (most significant), matching the reference
    x = _img(18, 17)  # H even, W odd at level 0
    ys, flags, pad_int = lazy_dwt(x, (0,), pad=True)
    assert flags == [(False, True)]
    assert pad_int == 1
    assert unpack_pad_flags(pad_int, 1) == flags


def test_padded_band_values_are_replicated():
    x = _img(17, 19)
    ys, flags, _ = lazy_dwt(x, (0,), pad=True)
    y0 = np.asarray(ys[0])
    x_np = np.asarray(x)
    # x01 (even rows, odd cols): true width is 9, padded col 9 replicates col 8
    np.testing.assert_array_equal(y0[:, :, 9, 6:9], y0[:, :, 8, 6:9])
    np.testing.assert_array_equal(
        y0[:, :, :9, 6:9], x_np[:, 0::2, 1::2, :]
    )


def test_pad_decoded_band_matches_encoder_padding():
    x = _img(17, 19)
    ys, flags, _ = lazy_dwt(x, (0,), pad=True)
    padH, padW = flags[0]
    y0 = np.asarray(ys[0])
    # band 0 = x11: coded (cropped) region, then re-pad must equal encoder's
    h, w = y0.shape[1], y0.shape[2]
    for band, sl in ((0, slice(3, 6)), (1, slice(6, 9)), (2, slice(9, 12))):
        ch, cw = band_coded_shape(h, w, band, padH, padW)
        coded = jnp.asarray(y0[:, :ch, :cw, sl])
        repad = pad_decoded_band(coded, band, padH, padW)
        np.testing.assert_array_equal(np.asarray(repad), y0[:, :, :, sl])
