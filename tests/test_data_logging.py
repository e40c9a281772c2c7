"""Data pipeline + rate logger + config + scheduler-integration tests."""
import json
import logging
import os

import numpy as np

from llicti_tpu.config import config_from_dict
from llicti_tpu.data.dataset import (EvalLoader, ImageDataset, TrainLoader,
                                     center_crop, random_patch,
                                     synthetic_image)
from llicti_tpu.utils.logging_utils import RateLogger
from llicti_tpu.utils.notify import Notifier


def test_synthetic_deterministic():
    a = synthetic_image(64, 48, seed=5)
    b = synthetic_image(64, 48, seed=5)
    np.testing.assert_array_equal(a, b)
    c = synthetic_image(64, 48, seed=6)
    assert not np.array_equal(a, c)
    assert a.shape == (64, 48, 3) and a.dtype == np.uint8


def test_random_patch_and_flip():
    rng = np.random.default_rng(0)
    img = synthetic_image(100, 120, seed=1)
    p = random_patch(img, 32, rng)
    assert p.shape == (32, 32, 3)


def test_upscale_small_images():
    rng = np.random.default_rng(0)
    img = synthetic_image(20, 150, seed=2)
    p = random_patch(img, 64, rng)
    assert p.shape == (64, 64, 3)


def test_center_crop():
    img = synthetic_image(100, 100, seed=3)
    c = center_crop(img, 48)
    assert c.shape == (48, 48, 3)
    np.testing.assert_array_equal(c, img[26:74, 26:74])


def test_train_loader_batches():
    ds = ImageDataset(synthetic_len=16, synthetic_size=64, seed=0)
    loader = TrainLoader(ds, batch_size=4, patch_size=32, grad_acc=2, seed=1)
    batches = list(loader)
    assert len(batches) == 2  # 16 images / (4*2)
    assert batches[0].shape == (2, 4, 32, 32, 3)
    assert batches[0].dtype == np.float32
    assert 0.0 <= batches[0].min() and batches[0].max() <= 1.0
    # next epoch shuffles differently
    batches2 = list(loader)
    assert not np.array_equal(batches[0], batches2[0])


def test_eval_loader_full_images():
    ds = ImageDataset(synthetic_len=3, synthetic_size=40, seed=0)
    imgs = list(EvalLoader(ds, 0))
    assert len(imgs) == 3
    assert imgs[0].shape == (1, 40, 40, 3)


def test_missing_dir_raises():
    try:
        ImageDataset(roots=["/nonexistent/path/xyz"])
        assert False
    except FileNotFoundError as e:
        assert "xyz" in str(e)


def test_rate_logger_table(caplog):
    lg = RateLogger("test-rate")
    lg(np.ones((2, 9)) * 0.5)
    lg(np.ones((2, 9)) * 1.5)
    with caplog.at_level(logging.INFO, logger="test-rate"):
        total, _ = lg.display(lr=1e-4, typ="tr")
    assert abs(total - 18.0) < 1e-6  # mean matrix is 1.0 everywhere
    text = caplog.text
    assert "(b0=3.000)" in text and "(s1=9.000)" in text
    assert "((18.000))" in text


def test_rate_logger_state_dict():
    lg = RateLogger("t2")
    lg(np.ones((1, 9)))
    d = lg.state_dict()
    lg2 = RateLogger("t3")
    lg2.load_state_dict(d)
    assert lg2.current_iteration == 1
    np.testing.assert_array_equal(lg2.rates[0], np.ones((1, 9)))


def test_reference_config_keys():
    raw = {
        "exp_name": "x", "mode": "train", "agent": "LLICTIAgent",
        "ycocg": True, "clrchs": 3, "clr_joint_mode": 2,
        "chs": [88, 1, 1, 1, 1], "conv_layers": 3,
        "Evens": [4, 4, 4, 4, 4], "Odds": [3, 3, 3, 3, 3],
        "dwtlevels": [0, 1, 2, 3, 4],
        "useprevlevNN": [False, True, True, True, True],
        "num_mixtures": 5, "batch_size": 32, "patch_size": 160,
        "learning_rate": 1e-4, "num_train_dirs": 1,
        "train_data_1": "/data/a", "valid_data": "/data/v",
        "test_data": "/data/t",
    }
    cfg = config_from_dict(raw)
    assert cfg.model.chs == (88, 1, 1, 1, 1)
    assert cfg.model.evens == (4, 4, 4, 4, 4)
    assert cfg.model.model_index == (0, 0, 0, 0, 0)
    assert cfg.train.batch_size == 32
    assert cfg.data.train_dirs == ("/data/a",)


def test_notifier_event_log(tmp_path):
    log = os.path.join(tmp_path, "events.jsonl")
    n = Notifier(event_log=log)
    assert n.send("done", "training finished")
    with open(log) as f:
        ev = json.loads(f.readline())
    assert ev["subject"] == "done"


def test_reference_config_files_parse():
    """The reference's shipped JSON configs load mechanically and build
    the paper model (SURVEY.md §2 row 17)."""
    import os

    import jax
    import jax.numpy as jnp

    from llicti_tpu.config import config_from_json
    from llicti_tpu.models.llicti import LLICTIModel

    path = "/root/reference/configs/llicti_A.json"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference tree not mounted")
    cfg = config_from_json(path)
    assert cfg.model.num_scales == 5
    assert cfg.model.chs[0] == 88
    assert cfg.model.num_mixtures == 5
    assert cfg.model.clr_joint_mode == 2
    assert cfg.train.batch_size == 32
    assert cfg.train.grad_acc_iters == 2
    assert cfg.mode == "eval_model"
    model = LLICTIModel(cfg=cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    n = sum(int(p.size) for p in jax.tree.leaves(params))
    assert n == 196596  # the logged "0.750MB"

    cfg_b = config_from_json("/root/reference/configs/llicti_B.json")
    assert cfg_b.mode == "train"
    assert cfg_b.train.resume_training is True
    assert cfg_b.model.num_scales == 2
