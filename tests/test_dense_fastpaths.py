"""Equivalence guards for the codec's fast execution paths.

The codec runs (a) grouped convs as dense block-diagonal convs
(dense_groups + dense_group_params) and (b) the CDF build via the
from-pmap Pallas kernel with a pmap_cdf_spec column map.  Both must
stay equivalent to the training-path math (gmm_slice_params +
gmm_cdf_table) for every clr_joint_mode, or encoder rate silently
degrades / param layouts drift.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llicti_tpu.codec import (Codec, dense_group_params, gmm_slice_params,
                              pmap_cdf_spec)
from llicti_tpu.coder import rans_device as rd
from llicti_tpu.config import ModelConfig, replace
from llicti_tpu.models.llicti import LLICTIModel
from llicti_tpu.ops.cdf_pallas import gmm_cdf_from_pmap_pallas
from llicti_tpu.ops.gmm import cdf_sampling_points, gmm_cdf_table

from test_codec_roundtrip import small_cfg


@pytest.mark.parametrize("kw", [
    dict(clr_joint_mode=2),
    dict(clr_joint_mode=1),
    dict(clr_joint_mode=0),
    dict(clr_joint_mode=2, mwsa_joint=True),
    dict(clr_joint_mode=2, combine_layers1toL=True),
])
def test_dense_groups_match_grouped(kw):
    """dense block-diagonal kernels produce the grouped conv's outputs."""
    cfg = small_cfg(**kw)
    model_g = LLICTIModel(cfg=cfg)
    model_d = LLICTIModel(cfg=cfg, dense_groups=True)
    c = cfg.cond_channels
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 4 * c),
                           minval=-0.4, maxval=0.4)
    params = model_g.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params_d = dense_group_params(params, cfg)
    for b in range(3):
        pg = model_g.apply(params, y[..., : c * (b + 1)], 0, b,
                           method=LLICTIModel.band_params)
        pd = model_d.apply(params_d, y[..., : c * (b + 1)], 0, b,
                           method=LLICTIModel.band_params)
        np.testing.assert_allclose(np.asarray(pg), np.asarray(pd),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("logistic", [False, True])
@pytest.mark.parametrize("mode", [0, 1, 2])
def test_pmap_cdf_spec_matches_slice_params(mode, logistic):
    """The in-kernel column spec reproduces gmm_slice_params + the
    XLA CDF table (within the A&S-vs-erfc approximation, < 2 of the
    2^16 quantization steps), for both normal and logistic mixtures
    (the logistic leg guards the SCALE_BOUND_LOGISTIC kernel import)."""
    cfg = small_cfg(clr_joint_mode=mode,
                    distribution="logistic" if logistic else "normal")
    model = LLICTIModel(cfg=cfg)
    c = cfg.cond_channels
    y = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 8, 4 * c),
                           minval=-0.4, maxval=0.4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    pts = cdf_sampling_points(-63, 64)
    for b in range(3):
        pmap = model.apply(params, y[..., : c * (b + 1)], 0, b,
                           method=LLICTIModel.band_params)
        for clr in range(3):
            s, m, w = gmm_slice_params(cfg, pmap, y, b, clr)
            ref = rd.cdf_float_to_cum_int32(
                gmm_cdf_table(pts, s, m, w, logistic=logistic))
            M, s0, m0, w0, upd = pmap_cdf_spec(cfg, b, clr)
            from llicti_tpu.codec import sym_channel
            ch = sym_channel(cfg, b, clr)
            got, kst, kfr = gmm_cdf_from_pmap_pallas(
                pts, pmap, y, M, s0, m0, w0, upd, logistic, ch, -63)
            diff = np.abs(np.asarray(ref, np.int64)
                          - np.asarray(got, np.int64)).max()
            assert diff <= 2, (b, clr, diff)
            # the kernel's (start, freq) equal the table lookup at the
            # true symbols
            gnp = np.asarray(got)
            sym = np.clip(np.round(np.asarray(y[..., ch]) * 255.0
                                   ).astype(np.int64) + 63, 0,
                          gnp.shape[-1] - 2)
            lo = np.take_along_axis(gnp, sym[..., None], -1)[..., 0]
            hi = np.take_along_axis(gnp, sym[..., None] + 1, -1)[..., 0]
            np.testing.assert_array_equal(np.asarray(kst), lo)
            np.testing.assert_array_equal(np.asarray(kfr), hi - lo)


def test_dynamic_y_range_header_roundtrip():
    """Y range restriction is lossless and shrinks the Y table for
    low-dynamic-range images."""
    cfg = small_cfg()
    from test_codec_roundtrip import make_codec

    codec = make_codec(cfg)
    rng = np.random.default_rng(0)
    dark = (rng.random((32, 32, 3)) * 40).astype(np.uint8)  # low range
    streams = codec.compress(dark)
    out = codec.decompress(streams)
    np.testing.assert_array_equal(out[0], dark)
    minmax = np.frombuffer(streams[0][1], np.int16)
    lo, hi = codec._clr_range(0, [int(v) for v in minmax])
    assert hi - lo < 255  # restricted vs the fixed [-127, 128]


@pytest.mark.parametrize("kw", [
    dict(),
    dict(distribution="logistic"),
    dict(clr_joint_mode=1),
    dict(clr_joint_mode=1, distribution="logistic"),
    dict(clr_joint_mode=0),
    dict(clr_joint_mode=0, distribution="logistic"),
    dict(clr_joint_mode=0, clrjnt0seqmd=True),
    dict(clr_joint_mode=0, clrjnt0seqmd=True, distribution="logistic"),
])
def test_roundtrip_with_pallas_cdf_interpret(kw):
    """Full codec round-trip through the Pallas CDF path (interpret mode
    on CPU) over the coded variant matrix {clrjnt 0/1/2, seqmd} x
    {normal, logistic}: in-kernel (start,freq) must feed the encode
    chain exactly.  The logistic legs are the TPU eval path that every
    tool enables (use_pallas_cdf=on_tpu) — regression for the
    SCALE_BOUND_LOGISTIC NameError."""
    cfg = small_cfg(**kw)
    from test_codec_roundtrip import natural_image

    model = LLICTIModel(cfg=cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    codec = Codec(cfg, params, num_lanes=16, use_pallas_cdf=True)
    img = natural_image(33, 37, seed=4)  # odd size: crop path too
    streams = codec.compress(img)
    out = codec.decompress(streams)
    np.testing.assert_array_equal(out[0], img)
    # byte-identical to the XLA path? NOT required (A&S erf vs erfc),
    # but rate must be close
    codec2 = Codec(cfg, params, num_lanes=16, use_pallas_cdf=False)
    s2 = codec2.compress(img)
    assert abs(Codec.num_bytes(streams) - Codec.num_bytes(s2)) < 64
