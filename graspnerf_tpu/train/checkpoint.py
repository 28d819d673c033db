"""Checkpoint save/restore with latest/best semantics (ref: trainer.py:183-218).

The reference torch.saves {step, best_para, network_state_dict,
optimizer_state_dict} to model.pth (+ model_best.pth on key-metric
improvement) and auto-resumes from latest. Same semantics here via Orbax:
  <dir>/latest  — params + opt_state + step + best metric value
  <dir>/best    — copy written when the key metric improves
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, prefer_lower: bool = True):
        self.dir = os.path.abspath(directory)
        self.prefer_lower = prefer_lower
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag):
        return os.path.join(self.dir, tag)

    def save(self, tree: Any, step: int, key_metric: Optional[float] = None,
             best: Optional[float] = None) -> float:
        """Save latest; promote to best when key_metric improves. Returns the
        updated best value."""
        payload = {"state": tree, "step": np.asarray(step),
                   "best": np.asarray(np.inf if best is None else best)}
        if key_metric is not None:
            improved = (key_metric < payload["best"] if self.prefer_lower
                        else key_metric > payload["best"])
            if improved or not np.isfinite(payload["best"]):
                payload["best"] = np.asarray(float(key_metric))
        p = self._path("latest")
        if os.path.exists(p):
            shutil.rmtree(p)
        self._ckptr.save(p, payload)
        self._ckptr.wait_until_finished()
        if key_metric is not None and float(payload["best"]) == float(key_metric):
            b = self._path("best")
            if os.path.exists(b):
                shutil.rmtree(b)
            shutil.copytree(p, b)
        return float(payload["best"])

    def restore(self, abstract_tree: Any, tag: str = "latest"):
        """Returns (state, step, best) or None if no checkpoint exists."""
        p = self._path(tag)
        if not os.path.exists(p):
            return None
        abstract = {
            "state": jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                            abstract_tree),
            "step": np.asarray(0),
            "best": np.asarray(0.0),
        }
        out = self._ckptr.restore(p, abstract)
        return out["state"], int(out["step"]), float(out["best"])
