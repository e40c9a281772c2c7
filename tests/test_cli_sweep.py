"""CLI multi-experiment sweep (reference main.py:17-24): one experiment
subdir + full lifecycle per sweep value, separate log trees (the
reference's run_once logging quirk — all values logging into the first
dir — is deliberately not replicated, SURVEY.md §3.5)."""
import json
import os
import subprocess
import sys


def test_multi_agent_sweep(tmp_path):
    cfg = {
        "exp_name": "sweep",
        "multi_exp_name": "sweep",
        "multi_agent": True,
        "multi_param": "learning_rate",
        "mode": "train",
        "agent": "LLICTIAgent",
        "model": {"chs": [4, 1], "evens": [4, 4], "odds": [3, 3],
                  "dwtlevels": [0, 1], "useprevlevNN": [False, True]},
        "train": {"batch_size": 2, "patch_size": 16, "max_epoch": 1,
                  "loss_prnt_iters": 100, "seed": 1},
        "data": {"synthetic": True, "synthetic_len": 4},
        "experiments_root": str(tmp_path),
        "learning_rate": [0.001, 0.0005],
    }
    cfg_path = tmp_path / "sweep.json"
    cfg_path.write_text(json.dumps(cfg))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "main.py", str(cfg_path), "--platform", "cpu"],
        cwd=repo, capture_output=True, text=True, timeout=500,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    for v in ("exp_0.001", "exp_0.0005"):
        d = tmp_path / "sweep" / v
        assert (d / "checkpoints").is_dir(), (v, out.stderr[-1500:])
        assert (d / "logs" / "exp_debug.log").exists()
