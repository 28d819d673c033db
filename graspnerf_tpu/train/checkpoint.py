"""Checkpoint save/restore with latest/best semantics (ref: trainer.py:183-218).

The reference torch.saves {step, best_para, network_state_dict,
optimizer_state_dict} to model.pth (+ model_best.pth on key-metric
improvement) and auto-resumes from latest. Same semantics here via Orbax,
made crash-safe: every save is written to a fresh step directory and the
`latest` / `best` names are symlinks updated with an atomic os.replace — a
crash at any point leaves the previous checkpoint fully intact (the reference
overwrites model.pth in place and can lose it).

Layout:
  <dir>/step_<n>   — immutable Orbax checkpoint {state, step, best}
  <dir>/latest     — symlink to the newest step dir
  <dir>/best       — symlink to the step dir with the best key metric
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _atomic_symlink(target: str, link: str):
    """Point `link` at `target` atomically (symlink to tmp + rename)."""
    tmp = link + ".tmp"
    if os.path.lexists(tmp):
        os.remove(tmp)
    os.symlink(target, tmp)
    os.replace(tmp, link)


class CheckpointManager:
    def __init__(self, directory: str, prefer_lower: bool = True):
        self.dir = os.path.abspath(directory)
        self.prefer_lower = prefer_lower
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag):
        return os.path.join(self.dir, tag)

    def _gc(self):
        """Remove step dirs no longer referenced by latest/best (and stale
        interrupted writes)."""
        keep = set()
        for tag in ("latest", "best"):
            p = self._path(tag)
            if os.path.lexists(p):
                keep.add(os.path.basename(os.path.realpath(p)))
        for name in os.listdir(self.dir):
            if name.startswith("step_") and name not in keep:
                shutil.rmtree(os.path.join(self.dir, name),
                              ignore_errors=True)

    def save(self, tree: Any, step: int, key_metric: Optional[float] = None,
             best: Optional[float] = None) -> float:
        """Save latest; promote to best when key_metric improves. Returns the
        updated best value."""
        payload = {"state": tree, "step": np.asarray(step),
                   "best": np.asarray(np.inf if best is None else best)}
        improved = False
        if key_metric is not None:
            improved = (key_metric < payload["best"] if self.prefer_lower
                        else key_metric > payload["best"])
            improved = improved or not np.isfinite(payload["best"])
            if improved:
                payload["best"] = np.asarray(float(key_metric))
        step_dir = self._path(f"step_{step}")
        if os.path.exists(step_dir):  # re-save at same step (resume overlap)
            shutil.rmtree(step_dir)
        self._ckptr.save(step_dir, payload)
        self._ckptr.wait_until_finished()
        # the new checkpoint is durable on disk before any name moves
        _atomic_symlink(step_dir, self._path("latest"))
        if improved:
            _atomic_symlink(step_dir, self._path("best"))
        self._gc()
        return float(payload["best"])

    def restore(self, abstract_tree: Any, tag: str = "latest"):
        """Returns (state, step, best) or None if no checkpoint exists."""
        p = self._path(tag)
        if not os.path.exists(p):  # follows symlinks; dangling link → None
            return None
        abstract = {
            "state": jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                            abstract_tree),
            "step": np.asarray(0),
            "best": np.asarray(0.0),
        }
        out = self._ckptr.restore(os.path.realpath(p), abstract)
        return out["state"], int(out["step"]), float(out["best"])
