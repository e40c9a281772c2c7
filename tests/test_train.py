"""Training-slice tests: loss decreases, grad-acc semantics, scheduler,
checkpoint round-trip."""
import jax
import jax.numpy as jnp
import numpy as np

from llicti_tpu.config import ModelConfig
from llicti_tpu.models.llicti import LLICTIModel
from llicti_tpu.training.loss import rate_loss_list
from llicti_tpu.training.schedule import ReduceLROnPlateau
from llicti_tpu.training.steps import (get_learning_rate, init_state,
                                       make_train_step, set_learning_rate)


def tiny_cfg():
    return ModelConfig(chs=(8, 1), evens=(4, 4), odds=(3, 3),
                       dwtlevels=(0, 1), useprevlevNN=(False, True))


def batches(n, acc=1, B=4, P=32, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        yy, xx = np.mgrid[0:P, 0:P].astype(np.float32)
        imgs = []
        for _ in range(acc * B):
            f = rng.uniform(5, 20)
            img = 0.5 + 0.3 * np.sin(yy / f) * np.cos(xx / f)
            img = np.stack([img, img * 0.9, img * 0.8], -1)
            img += rng.normal(0, 0.02, img.shape)
            imgs.append(np.clip(img, 0, 1))
        yield np.stack(imgs).reshape(acc, B, P, P, 3).astype(np.float32)


def test_loss_decreases():
    cfg = tiny_cfg()
    model = LLICTIModel(cfg=cfg)
    state, tx = init_state(model, cfg, jax.random.PRNGKey(0),
                           jnp.zeros((4, 32, 32, 3)), 1e-3)
    step = jax.jit(make_train_step(model, tx))
    losses = []
    for batch in batches(25):
        state, m = step(state, jnp.asarray(batch))
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.1, losses


def test_breakdown_shape_and_sum():
    cfg = tiny_cfg()
    model = LLICTIModel(cfg=cfg)
    state, tx = init_state(model, cfg, jax.random.PRNGKey(0),
                           jnp.zeros((2, 32, 32, 3)), 1e-4)
    step = jax.jit(make_train_step(model, tx))
    batch = next(batches(1, B=2))
    state, m = step(state, jnp.asarray(batch))
    bd = np.asarray(m["breakdown"])
    assert bd.shape == (2, 9)
    np.testing.assert_allclose(bd.sum(), float(m["loss"]), rtol=1e-5)


def test_grad_acc_equivalent_to_big_batch():
    """acc=2 with B=2 must match acc=1 with B=4 (same samples)."""
    cfg = tiny_cfg()
    model = LLICTIModel(cfg=cfg)
    batch = next(batches(1, acc=1, B=4))  # [1, 4, P, P, 3]

    def loss(params, xb):
        si = model.apply(params, xb)
        return rate_loss_list(xb.size, si)[0]

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch[0]))
    g_big = jax.grad(loss)(params, jnp.asarray(batch[0]))
    b2 = batch.reshape(2, 2, *batch.shape[2:])
    g_acc = jax.tree.map(jnp.zeros_like, params)
    for i in range(2):
        g = jax.grad(loss)(params, jnp.asarray(b2[i]))
        g_acc = jax.tree.map(lambda a, b: a + b / 2, g_acc, g)
    for a, b in zip(jax.tree.leaves(g_big), jax.tree.leaves(g_acc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_set_learning_rate():
    cfg = tiny_cfg()
    model = LLICTIModel(cfg=cfg)
    state, tx = init_state(model, cfg, jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), 1e-4)
    assert abs(get_learning_rate(state) - 1e-4) < 1e-9  # f32 storage
    state = set_learning_rate(state, 5e-5)
    assert abs(get_learning_rate(state) - 5e-5) < 1e-9


def test_plateau_scheduler():
    s = ReduceLROnPlateau(lr=1e-4, patience=2, cooldown=1, factor=0.5,
                          min_lr=1e-5)
    # improving: no change
    for v in (10.0, 9.0, 8.0):
        assert s.step(v) == 1e-4
    # stall for patience+1 evals -> halve
    for v in (8.0, 8.0):
        s.step(v)
    assert s.step(8.0) == 5e-5
    # state dict round-trip
    d = s.state_dict()
    s2 = ReduceLROnPlateau(lr=1.0)
    s2.load_state_dict(d)
    assert s2.lr == s.lr and s2.best == s.best


def test_checkpoint_roundtrip(tmp_path):
    from llicti_tpu.utils.checkpoint import CheckpointManager

    cfg = tiny_cfg()
    model = LLICTIModel(cfg=cfg)
    state, tx = init_state(model, cfg, jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), 1e-4)
    mgr = CheckpointManager(str(tmp_path))
    meta = {"epoch": 3, "iteration": 77, "best_valid_loss": 1.5}
    mgr.save("checkpoint", state, meta, is_best=True)
    state2, meta2 = mgr.load("checkpoint", state)
    assert meta2["iteration"] == 77
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert mgr.exists("model_best")
