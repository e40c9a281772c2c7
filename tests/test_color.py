"""YCoCg-R transform round-trip tests (bit-exactness foundation)."""
import jax.numpy as jnp
import numpy as np

from llicti_tpu.ops.color import (
    rgb_int_to_ycocg_r_int,
    rgb_to_ycocg_r,
    ycocg_r_int_to_rgb_int,
    ycocg_r_to_rgb,
)


def test_int_roundtrip_exhaustive_sample():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.int32)
    ycocg = rgb_int_to_ycocg_r_int(jnp.asarray(rgb))
    back = ycocg_r_int_to_rgb_int(ycocg)
    np.testing.assert_array_equal(np.asarray(back), rgb)


def test_int_roundtrip_all_extremes():
    # all 8 corner colors plus greys
    vals = []
    for r in (0, 255):
        for g in (0, 255):
            for b in (0, 255):
                vals.append((r, g, b))
    for v in range(256):
        vals.append((v, v, v))
    rgb = np.array(vals, dtype=np.int32).reshape(1, -1, 1, 3)
    back = ycocg_r_int_to_rgb_int(rgb_int_to_ycocg_r_int(jnp.asarray(rgb)))
    np.testing.assert_array_equal(np.asarray(back), rgb)


def test_int_ranges():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(1, 32, 32, 3), dtype=np.int32)
    y = np.asarray(rgb_int_to_ycocg_r_int(jnp.asarray(rgb)))
    assert y[..., 0].min() >= 0 and y[..., 0].max() <= 255
    assert abs(y[..., 1]).max() <= 255 and abs(y[..., 2]).max() <= 255


def test_float_roundtrip_close():
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, size=(1, 16, 16, 3)).astype(np.float32) / 255.0
    y = rgb_to_ycocg_r(jnp.asarray(rgb))
    back = ycocg_r_to_rgb(y)
    np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-6)


def test_float_matches_int_y_channel():
    # The float transform's Y should be within rounding of the int one.
    rng = np.random.default_rng(3)
    rgb_i = rng.integers(0, 256, size=(1, 16, 16, 3), dtype=np.int32)
    y_int = np.asarray(rgb_int_to_ycocg_r_int(jnp.asarray(rgb_i)))
    y_flt = np.asarray(rgb_to_ycocg_r(jnp.asarray(rgb_i.astype(np.float32) / 255.0)))
    # Co is exact in both (no lifting rounding involved)
    np.testing.assert_allclose(y_flt[..., 1] * 255, y_int[..., 1], atol=1e-4)
    # Y/Cg differ at most by the floor-vs-round lifting difference (1 step)
    assert np.max(np.abs(y_flt[..., 0] * 255 - y_int[..., 0])) <= 1.0 + 1e-3
    assert np.max(np.abs(y_flt[..., 2] * 255 - y_int[..., 2])) <= 1.0 + 1e-3


def test_numpy_twin_matches_device_int_transform():
    """The host (numpy) integer lifting used for encode headers must be
    bit-exact with the jnp version (the encoder derives the container
    minmax/raw band on host to avoid a per-image device sync)."""
    from llicti_tpu.ops.color import rgb_int_to_ycocg_r_int_np

    rng = np.random.default_rng(4)
    rgb_i = rng.integers(0, 256, size=(2, 17, 23, 3), dtype=np.int32)
    dev = np.asarray(rgb_int_to_ycocg_r_int(jnp.asarray(rgb_i)))
    host = rgb_int_to_ycocg_r_int_np(rgb_i)
    np.testing.assert_array_equal(dev, host)
    # extremes included (floor-division sign behavior)
    edges = np.array([[[0, 0, 0], [255, 255, 255], [255, 0, 255],
                       [0, 255, 0], [255, 0, 0], [0, 0, 255]]], np.int32)
    np.testing.assert_array_equal(
        np.asarray(rgb_int_to_ycocg_r_int(jnp.asarray(edges))),
        rgb_int_to_ycocg_r_int_np(edges))
