"""Checkpoint/resume with the reference's semantic payload.

Saves model params + optimizer state (Orbax) alongside the host-side
training state (epoch, iteration, best_valid_loss, LR-scheduler and
rate-logger state) as JSON — the same payload the reference pickles
(agents/base.py:83-100).  ``save(..., is_best=True)`` additionally copies
to ``model_best`` (reference base.py:98-100).
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


class CheckpointManager:
    def __init__(self, ckpt_dir: str):
        self.dir = _abs(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _paths(self, name: str) -> Tuple[str, str]:
        return (os.path.join(self.dir, name + ".orbax"),
                os.path.join(self.dir, name + ".meta.json"))

    def save(self, name: str, state, meta: dict, is_best: bool = False) -> None:
        tree_path, meta_path = self._paths(name)
        tmp = tree_path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._ckptr.save(tmp, state)
        self._ckptr.wait_until_finished()
        if os.path.exists(tree_path):
            shutil.rmtree(tree_path)
        os.replace(tmp, tree_path)
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        if is_best:
            best_tree, best_meta = self._paths("model_best")
            if os.path.exists(best_tree):
                shutil.rmtree(best_tree)
            shutil.copytree(tree_path, best_tree)
            shutil.copyfile(meta_path, best_meta)

    def load(self, name: str, target) -> Tuple[Any, dict]:
        """Restore (state_like_target, meta). Raises FileNotFoundError."""
        tree_path, meta_path = self._paths(name)
        if not os.path.exists(tree_path):
            raise FileNotFoundError(tree_path)
        state = self._ckptr.restore(tree_path, target=target)
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return state, meta

    def exists(self, name: str) -> bool:
        return os.path.exists(self._paths(name)[0])
