"""Codec round-trips for config variants beyond the reference's coder.

The reference entropy-codes only clrchs=3 + clr_joint_mode=2 + normal GMM
(LLICTI_nets.py:937-939 assumes that layout); our codec additionally
codes clr_joint_mode 0 and 1 and the logistic distribution — the layouts
follow Interpolator.self_informations (reference :827-935).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llicti_tpu.codec import Codec
from llicti_tpu.models.llicti import LLICTIModel

from test_codec_roundtrip import natural_image, small_cfg


def make_codec(cfg, seed=0, backend="device"):
    model = LLICTIModel(cfg=cfg)
    lev = max(cfg.dwtlevels) + 1
    x = jnp.zeros((1, 2 ** lev * 4, 2 ** lev * 4, 3))
    params = model.init(jax.random.PRNGKey(seed), x)
    return Codec(cfg, params, backend=backend, num_lanes=32)


@pytest.mark.parametrize("mode", [0, 1])
@pytest.mark.parametrize("backend", ["device", "host"])
def test_roundtrip_clrjnt(mode, backend):
    cfg = small_cfg(clr_joint_mode=mode)
    codec = make_codec(cfg, backend=backend)
    img = natural_image(36, 44, seed=mode)  # odd band sizes at scale 1
    streams = codec.compress(img)
    out = codec.decompress(streams)
    assert np.array_equal(out[0], img)


def test_roundtrip_logistic():
    cfg = small_cfg(distribution="logistic")
    codec = make_codec(cfg)
    img = natural_image(32, 32, seed=9)
    streams = codec.compress(img)
    out = codec.decompress(streams)
    assert np.array_equal(out[0], img)


def test_roundtrip_logistic_clrjnt1():
    cfg = small_cfg(distribution="logistic", clr_joint_mode=1)
    codec = make_codec(cfg)
    img = natural_image(20, 28, seed=11)
    streams = codec.compress(img)
    out = codec.decompress(streams)
    assert np.array_equal(out[0], img)


def test_roundtrip_clrjnt0_seqmd():
    """Sequential-color conditioning now entropy-codes (device backend):
    per-color band params recomputed causally inside the fused program."""
    cfg = small_cfg(clr_joint_mode=0, clrjnt0seqmd=True)
    codec = make_codec(cfg)
    img = natural_image(32, 36, seed=13)
    streams = codec.compress(img)
    out = codec.decompress(streams)
    assert np.array_equal(out[0], img)


def test_clrjnt0seqmd_host_backend_rejected():
    cfg = small_cfg(clr_joint_mode=0, clrjnt0seqmd=True)
    with pytest.raises(AssertionError):
        make_codec(cfg, backend="host")
