"""Trainer lifecycle smoke tests (train -> validate -> checkpoint ->
resume -> eval_model) on synthetic data, all in-process."""
import dataclasses
import os

import numpy as np
import pytest

from llicti_tpu.config import (DataConfig, LLICTIConfig, ModelConfig,
                               TrainConfig)
from llicti_tpu.training.trainer import Trainer, pad_to_multiple


def tiny_config(tmp_path, **train_kw):
    model = ModelConfig(chs=(8, 1), evens=(4, 4), odds=(3, 3),
                        dwtlevels=(0, 1), useprevlevNN=(False, True))
    tkw = dict(batch_size=2, patch_size=32, grad_acc_iters=1,
               loss_prnt_iters=100, learning_rate=1e-3, max_epoch=1,
               seed=3, val_patch_size=32)
    tkw.update(train_kw)
    return LLICTIConfig(
        exp_name="t", mode="train",
        model=model, train=TrainConfig(**tkw),
        data=DataConfig(synthetic=True, synthetic_len=8),
        experiments_root=str(tmp_path),
    )


def test_pad_to_multiple():
    x = np.zeros((1, 30, 33, 3), np.float32)
    y = pad_to_multiple(x, 8)
    assert y.shape == (1, 32, 40, 3)
    np.testing.assert_array_equal(y[:, :30, :33], x)


def test_train_validate_checkpoint_resume(tmp_path):
    cfg = tiny_config(tmp_path)
    tr = Trainer(cfg)
    tr.run()
    tr.finalize()  # the CLI flow: run + finalize (writes epoch-complete meta)
    assert tr.current_iteration == 4  # 8 imgs / batch 2
    assert tr.ckpt.exists("checkpoint")
    assert tr.ckpt.exists("model_best")
    loss1 = tr.best_valid_loss
    assert np.isfinite(loss1)

    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resume_training=True,
                                       max_epoch=2))
    tr2 = Trainer(cfg2)
    assert tr2.current_iteration == 4
    tr2.run()
    assert tr2.current_iteration == 8


def test_eval_model_roundtrip(tmp_path):
    cfg = tiny_config(tmp_path)
    tr = Trainer(cfg)
    tr.run()
    cfg_eval = dataclasses.replace(cfg, mode="eval_model")
    tre = Trainer(cfg_eval)
    results = tre.eval_model()
    assert len(results) > 0
    assert all(r["ok"] for r in results)
    assert all(0 < r["bpsp"] < 24 for r in results)


def test_test_mode_estimate_only(tmp_path):
    """'test' mode runs an estimate-only eval over the test set (the
    reference's test() is an empty stub; ours reports the mean rate)."""
    cfg = tiny_config(tmp_path)
    tr = Trainer(cfg)
    tr.run()
    cfg_test = dataclasses.replace(cfg, mode="test")
    trt = Trainer(cfg_test)
    loss = trt.test()
    assert np.isfinite(loss) and 0 < loss < 48


def test_crash_notification_written(tmp_path):
    """An unexpected exception writes a failure event (wired Notifier;
    the reference imports its Mailer but never calls it)."""
    import json

    cfg = dataclasses.replace(tiny_config(tmp_path), mode="bogus_mode")
    tr = Trainer(cfg)
    with pytest.raises(NameError):
        tr.run()
    log = os.path.join(cfg.log_dir, "events.jsonl")
    assert os.path.exists(log)
    ev = json.loads(open(log).read().splitlines()[-1])
    assert "crashed" in ev["subject"] and "bogus_mode" in ev["subject"]
