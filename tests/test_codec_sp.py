"""Multi-chip spatially-sharded codec tests (8-device CPU mesh).

The sharded codec tiles the image's rows across a 1-D ``sp`` mesh with
one rANS stream per shard (SURVEY.md §2.3.3-4); conv/CDF math runs under
GSPMD so halo exchange is automatic.  Losslessness must hold for any
model weights, any mesh size, and arbitrary (padded) image sizes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llicti_tpu.config import ModelConfig
from llicti_tpu.models.llicti import LLICTIModel
from llicti_tpu.parallel.codec_sp import ShardedCodec, make_sp_mesh

from test_codec_roundtrip import natural_image, small_cfg


def make_sharded(cfg, shards, seed=0, num_lanes=16):
    model = LLICTIModel(cfg=cfg)
    lev = max(cfg.dwtlevels) + 1
    x = jnp.zeros((1, 2 ** lev * 4, 2 ** lev * 4, 3))
    params = model.init(jax.random.PRNGKey(seed), x)
    mesh = make_sp_mesh(shards=shards)
    return ShardedCodec(cfg, params, mesh=mesh, num_lanes=num_lanes)


@pytest.mark.parametrize("shards", [2, 8])
def test_sharded_roundtrip(shards):
    cfg = small_cfg()
    codec = make_sharded(cfg, shards)
    img = natural_image(64, 32, seed=3)
    streams = codec.compress(img)
    out = codec.decompress(streams)
    assert out.shape == (1, 64, 32, 3)
    assert np.array_equal(out[0], img)
    assert len(streams[1]) == shards


def test_sharded_roundtrip_odd_size():
    """Arbitrary sizes replicate-pad to the mesh multiple and crop back."""
    cfg = small_cfg()
    codec = make_sharded(cfg, 4)
    img = natural_image(50, 37, seed=5)
    streams = codec.compress(img)
    out = codec.decompress(streams)
    assert out.shape == (1, 50, 37, 3)
    assert np.array_equal(out[0], img)


def test_sharded_rate_close_to_single_chip():
    """Per-shard streams cost a little extra (state flushes, seam pads);
    total size should stay within ~20% of the single-chip codec."""
    from llicti_tpu.codec import Codec

    cfg = small_cfg()
    model = LLICTIModel(cfg=cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    img = natural_image(64, 64, seed=7)

    single = Codec(cfg, params, num_lanes=16)
    sharded = ShardedCodec(cfg, params, mesh=make_sp_mesh(shards=4),
                           num_lanes=16)
    nb_single = Codec.num_bytes(single.compress(img))
    nb_sharded = ShardedCodec.num_bytes(sharded.compress(img))
    assert nb_sharded < nb_single * 1.2 + 200
