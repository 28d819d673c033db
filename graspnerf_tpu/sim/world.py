"""Simulation worlds for closed-loop grasp evaluation.

The reference evaluates with pybullet physics + Blender rendering
(ref: src/gd/simulation.py, gd/utils/btsim.py). This environment has neither,
so the harness is built around a World interface with two backends:

  AnalyticWorld  — primitive scenes (graspnerf_tpu.data.synthetic.Scene):
                   analytic ray-traced RGB-D observation and a geometric
                   grasp-success model (pose must straddle an object surface
                   with adequate clearance). Always available; deterministic.
  PybulletWorld  — thin adapter with the reference's contract (reset/
                   acquire images/execute_grasp via a physics server); only
                   importable when pybullet is installed.

Both expose: reset(n_objects) → scene; num_objects; observe(pose, K, h, w) →
(rgb, depth); execute_grasp(pose, width) → (Label, width).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..data.synthetic import Scene
from .grasp import Label
from .transform import Transform


class AnalyticWorld:
    """Geometric grasp model on primitive scenes.

    A grasp succeeds when the TCP is within `surface_tol` of some object's
    surface, the object fits in the gripper opening, and the approach is not
    through the table (TCP above z_min). Successful grasps remove the object.
    """

    def __init__(self, rng: np.random.RandomState | None = None,
                 surface_tol: float = 0.01, max_opening: float = 0.08,
                 z_min: float = 0.005):
        self.rng = rng or np.random.RandomState(0)
        self.surface_tol = surface_tol
        self.max_opening = max_opening
        self.z_min = z_min
        self.scene: Scene | None = None

    def reset(self, n_objects: int = 4) -> Scene:
        self.scene = Scene(self.rng, n_objects)
        return self.scene

    @property
    def num_objects(self) -> int:
        return len(self.scene.spheres) + len(self.scene.boxes)

    def observe(self, pose, K, h: int, w: int):
        """Render RGB-D from a world→cam pose [3,4]."""
        rgb, depth, _ = self.scene.render(pose, K, h, w)
        return rgb, depth

    # ------------------------------------------------------------- grasping
    def _object_distances(self, p: np.ndarray):
        """Distance from point p to each object's surface + object size."""
        dists, sizes = [], []
        for c, r in self.scene.spheres:
            dists.append(abs(np.linalg.norm(p - c) - r))
            sizes.append(2 * r)
        for lo, hi in self.scene.boxes:
            q = np.maximum(lo - p, np.maximum(0.0, p - hi))
            outside = np.linalg.norm(q)
            inside = min(np.min(p - lo), np.min(hi - p))
            dists.append(outside if outside > 0 else abs(inside))
            sizes.append(float(np.min(hi - lo)))
        return np.asarray(dists), np.asarray(sizes)

    def execute_grasp(self, pose: Transform, width: float,
                      remove: bool = True) -> Tuple[Label, float]:
        p = np.asarray(pose.translation, np.float64)
        if self.num_objects == 0 or p[2] < self.z_min:
            return Label.FAILURE, 0.0
        dists, sizes = self._object_distances(p)
        i = int(np.argmin(dists))
        graspable = (dists[i] < self.surface_tol
                     and sizes[i] <= self.max_opening
                     and width >= sizes[i] * 0.5)
        if not graspable:
            return Label.FAILURE, 0.0
        if remove:
            ns = len(self.scene.spheres)
            if i < ns:
                self.scene.spheres.pop(i)
            else:
                self.scene.boxes.pop(i - ns)
        return Label.SUCCESS, float(width)


class PybulletWorld:
    """Adapter for the reference's pybullet harness (gd/utils/btsim.py,
    gd/simulation.py). Requires pybullet; see the reference for URDF assets."""

    def __init__(self, *a, **kw):
        try:
            import pybullet  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "pybullet is not installed in this environment; use "
                "AnalyticWorld, or install pybullet + the reference's URDF "
                "assets for physics-backed evaluation") from e
        raise NotImplementedError(
            "physics-backed world: port of ClutterRemovalSim/Gripper state "
            "machine (ref simulation.py:341-558) pending a pybullet install")
