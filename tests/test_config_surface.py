"""Every ModelConfig knob is either exercised or rejected loudly.

Covers the config corners the reference exposes but barely uses:
single-channel clrchs<3 training (reference LLICTI_nets.py:196-216,
628-648), mwsa_joint merged convs (:625,:633), GDN1 activation
(:690-691), and the dead knobs wtr_type='x' (agents/llicti_agent.py:19-26
empty placeholder) / net_type (stored-but-never-read, LLICTI_nets.py:590)
/ ent_mdl_num 0/3 (pass-stubs, :288-291) which must raise up front.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llicti_tpu.config import ModelConfig, replace
from llicti_tpu.models.llicti import LLICTIModel
from llicti_tpu.training.steps import init_state, make_train_step

from test_train import batches, tiny_cfg


def _train_steps(cfg, n=8, B=4, P=32):
    model = LLICTIModel(cfg=cfg)
    state, tx = init_state(model, cfg, jax.random.PRNGKey(0),
                           jnp.zeros((B, P, P, 3)), 1e-3)
    step = jax.jit(make_train_step(model, tx))
    losses = []
    for batch in batches(n, B=B, P=P):
        state, m = step(state, jnp.asarray(batch))
        losses.append(float(m["loss"]))
    return losses


@pytest.mark.parametrize("clrchs", [0, 1, 2])
def test_single_channel_clrchs_trains(clrchs):
    """clrchs<3 models one YCoCg channel (index=clrchs) per the
    reference's single-channel variant; must train with finite,
    decreasing loss."""
    cfg = replace(tiny_cfg(), clrchs=clrchs, clr_joint_mode=0)
    assert cfg.cond_channels == 1
    losses = _train_steps(cfg)
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses


def test_mwsa_joint_trains_and_changes_params():
    base = tiny_cfg()
    joint = replace(base, mwsa_joint=True)
    model_b = LLICTIModel(cfg=base)
    model_j = LLICTIModel(cfg=joint)
    x = jnp.zeros((1, 32, 32, 3))
    nb = sum(p.size for p in jax.tree.leaves(
        model_b.init(jax.random.PRNGKey(0), x)))
    nj = sum(p.size for p in jax.tree.leaves(
        model_j.init(jax.random.PRNGKey(0), x)))
    # mwsa_joint=True merges the 4 parameter-group convs into ONE full
    # conv with grps=1, so Ch = 1*ch instead of 4*ch: strictly fewer
    # params (reference LLICTI_nets.py:625-627)
    assert nj < nb
    losses = _train_steps(joint, n=4)
    assert all(np.isfinite(l) for l in losses), losses


def test_gdn1_activation_trains():
    cfg = replace(tiny_cfg(), activfun="GDN1")
    losses = _train_steps(cfg, n=6)
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses


def test_wtr_type_x_rejected():
    with pytest.raises(NotImplementedError, match="wtr_type"):
        ModelConfig(wtr_type="x")


def test_net_type_rejected():
    with pytest.raises(NotImplementedError, match="net_type"):
        ModelConfig(net_type="fancy")


def test_ent_mdl_num_stubs_rejected():
    with pytest.raises(NotImplementedError, match="ent_mdl_num"):
        ModelConfig(ent_mdl_num=0)


def test_bad_distribution_rejected():
    with pytest.raises(NotImplementedError, match="distribution"):
        ModelConfig(distribution="cauchy")


# --- TrainConfig / DataConfig surface (reference image_dl.py:33-44) ---------


def test_dl_numworkers_deterministic():
    """Batches are keyed by (seed, epoch, step): identical for any
    worker-thread count (the torch analog reorders under >0 workers; we
    keep order AND determinism)."""
    from llicti_tpu.data.dataset import ImageDataset, TrainLoader

    ds = ImageDataset(synthetic_len=24, synthetic_size=48, seed=0)
    a = list(TrainLoader(ds, batch_size=4, patch_size=32, grad_acc=2,
                         seed=7, num_threads=1))
    b = list(TrainLoader(ds, batch_size=4, patch_size=32, grad_acc=2,
                         seed=7, num_threads=3))
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_val_batch_size_batches():
    from llicti_tpu.data.dataset import EvalLoader, ImageDataset

    ds = ImageDataset(synthetic_len=6, synthetic_size=64, seed=0)
    batches = list(EvalLoader(ds, patch_size=32, batch_size=4))
    assert [b.shape[0] for b in batches] == [4, 2]
    assert batches[0].shape[1:] == (32, 32, 3)
    # batch 1 unchanged default
    singles = list(EvalLoader(ds, patch_size=32))
    assert [b.shape[0] for b in singles] == [1] * 6


def test_val_batch_ragged_flush():
    """Full-size (patch 0) images of different shapes flush at shape
    boundaries instead of crashing the stack."""
    from llicti_tpu.data.dataset import EvalLoader, ImageDataset

    class Ragged(ImageDataset):
        def __init__(self):
            super().__init__(synthetic_len=5, synthetic_size=64, seed=0)

        def get(self, i):
            img = super().get(i)
            return img[: 32 + 8 * (i // 2)]  # 32,32,40,40,48

    batches = list(EvalLoader(Ragged(), patch_size=0, batch_size=8))
    assert [b.shape[:2] for b in batches] == [(2, 32), (2, 40), (1, 48)]


def test_trainer_wires_loader_knobs(tmp_path):
    """dl_numworkers reaches TrainLoader, val_batch_size reaches
    EvalLoader, num_data_shards builds a DP mesh."""
    from llicti_tpu.config import (DataConfig, LLICTIConfig, TrainConfig,
                                   config_from_dict)
    from llicti_tpu.training.trainer import Trainer

    cfg = LLICTIConfig(
        exp_name="knobs", mode="train",
        model=tiny_cfg(),
        train=TrainConfig(batch_size=2, patch_size=32, grad_acc_iters=1,
                          val_batch_size=3, num_data_shards=2),
        data=DataConfig(synthetic=True, synthetic_len=8, dl_numworkers=3),
        experiments_root=str(tmp_path),
    )
    tr = Trainer(cfg)
    assert tr.train_loader.num_threads == 3
    assert tr.valid_loader.batch_size == 3
    assert tr.mesh is not None
    assert dict(zip(tr.mesh.axis_names, tr.mesh.devices.shape))["data"] == 2
    # reference-key JSON path carries the knobs too
    c2 = config_from_dict({"dl_numworkers": 5, "val_batch_size": 7})
    assert c2.data.dl_numworkers == 5
    assert c2.train.val_batch_size == 7
