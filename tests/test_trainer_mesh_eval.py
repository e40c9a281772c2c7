"""eval_model through the CLI trainer with a multi-device mesh uses the
spatially-sharded codec and still round-trips losslessly."""
import json
import os

from llicti_tpu.config import config_from_dict
from llicti_tpu.training.trainer import Trainer


def test_eval_model_sharded(tmp_path):
    cfg = config_from_dict({
        "exp_name": "mesh_eval",
        "mode": "eval_model",
        "model": {"chs": [8, 1], "evens": [4, 4], "odds": [3, 3],
                  "dwtlevels": [0, 1], "useprevlevNN": [False, True]},
        "train": {"batch_size": 2, "patch_size": 32, "seed": 3},
        "data": {"synthetic": True, "synthetic_len": 2},
        "experiments_root": str(tmp_path),
    })
    tr = Trainer(cfg, use_mesh=True)
    assert tr.mesh is not None and tr.mesh.devices.size > 1
    results = tr.eval_model()
    assert results and all(r["ok"] for r in results)
    # the mesh path now carries the two-sided coder-closure leg
    # (sharded ideal bits): present and tight on every image
    for r in results:
        assert r["coder_gap_pct"] is not None
        assert abs(r["coder_gap_pct"]) < 10.0
