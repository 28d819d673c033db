"""Closed-loop clutter-removal experiment (ref: src/gd/experiments/
clutter_removal.py:30-255 + scripts/stat_expresult.py).

One round: reset world → observe 6 hemisphere views → planner → execute best
grasp → repeat until the workspace is cleared or 2 consecutive failures.
Logs rounds.csv / grasps.csv with the reference's schema and computes the
reference's metrics (grasp success rate, percent cleared, first-grasp SR,
mean planning time).
"""
from __future__ import annotations

import csv
import os
import time
import uuid
from typing import Callable, Optional

import numpy as np

from ..data.synthetic import hemisphere_poses, intrinsics, DEPTH_RANGE, BBOX_MIN
from ..ops.tsdf import integrate_tsdf, VOLUME_SIZE
from .world import AnalyticWorld, Label

MAX_CONSECUTIVE_FAILURES = 2


class Logger:
    """rounds.csv / grasps.csv with the reference's columns
    (ref clutter_removal.py:153-218)."""

    def __init__(self, logdir: str):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self.rounds_path = os.path.join(logdir, "rounds.csv")
        self.grasps_path = os.path.join(logdir, "grasps.csv")
        for path, hdr in ((self.rounds_path, ["round_id", "object_count"]),
                          (self.grasps_path,
                           ["round_id", "scene_id", "qx", "qy", "qz", "qw",
                            "x", "y", "z", "width", "score", "label",
                            "integration_time", "planning_time"])):
            if not os.path.exists(path):
                with open(path, "w", newline="") as f:
                    csv.writer(f).writerow(hdr)

    def log_round(self, round_id, object_count):
        with open(self.rounds_path, "a", newline="") as f:
            csv.writer(f).writerow([round_id, object_count])

    def log_grasp(self, round_id, grasp, score, label, t_int, t_plan):
        pose, width = grasp
        q = pose.rotation.as_quat()
        t = pose.translation
        with open(self.grasps_path, "a", newline="") as f:
            csv.writer(f).writerow(
                [round_id, uuid.uuid4().hex[:8], *np.round(q, 6),
                 *np.round(t, 6), round(width, 6), round(float(score), 4),
                 int(label), round(t_int, 4), round(t_plan, 4)])


def acquire_tsdf(world, n_views: int = 6, h: int = 96, w: int = 128):
    """GT/diagnostic TSDF from depth renders on the hemisphere
    (ref simulation.py:341-367, with our own fusion instead of Open3D)."""
    poses = hemisphere_poses()[:n_views * 4:4]
    K = intrinsics(h, w)
    depths, exts, Ks = [], [], []
    shift = np.eye(4, dtype=np.float32)
    shift[:3, 3] = BBOX_MIN
    for pose in poses:
        _, d = world.observe(pose, K, h, w)
        depths.append(d)
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :] = pose
        exts.append(ext @ shift)
        Ks.append(K)
    t0 = time.time()
    tsdf, wgt = integrate_tsdf(np.stack(depths), np.stack(Ks), np.stack(exts),
                               VOLUME_SIZE, 40)
    tsdf = np.where(np.asarray(wgt) > 0, np.asarray(tsdf), -1.0)
    return tsdf.astype(np.float32), time.time() - t0


def run(planner: Callable, logdir: str, n_rounds: int = 5,
        n_objects: int = 4, n_views: int = 6, h: int = 96, w: int = 128,
        seed: int = 0, world: Optional[AnalyticWorld] = None):
    """planner(images [V,h,w,3], extrinsics [V,3,4], Ks [V,3,3],
    depth_range, round_idx, n_grasp) → (grasps, scores, planning_time).
    Returns the metrics dict."""
    rng = np.random.RandomState(seed)
    world = world or AnalyticWorld(rng)
    logger = Logger(logdir)
    K = intrinsics(h, w)

    for round_id in range(n_rounds):
        world.reset(n_objects)
        logger.log_round(round_id, world.num_objects)
        consecutive_failures = 0
        n_grasp = 0
        while world.num_objects > 0 and \
                consecutive_failures < MAX_CONSECUTIVE_FAILURES:
            # observe 6 views (equally-spaced azimuths, fixed elevation row —
            # the reference's render_frame_list pattern)
            view_poses = hemisphere_poses()[6:12][:n_views]
            images = []
            for pose in view_poses:
                rgb, _ = world.observe(pose, K, h, w)
                images.append(rgb)
            images = np.stack(images)
            Ks = np.tile(K[None], (n_views, 1, 1))
            dr = np.tile(DEPTH_RANGE[None], (n_views, 1))

            _, t_int = acquire_tsdf(world, n_views, h, w)
            grasps, scores, t_plan = planner(images, view_poses, Ks, dr,
                                             round_id, n_grasp)
            if len(grasps) == 0:
                break
            # execute the highest-scoring grasp (planner already permutes;
            # take argmax like the reference's first-of-sorted)
            i = int(np.argmax(scores))
            # planner grasp translations are volume-local; shift to world
            pose, width = grasps[i]
            from .transform import Transform
            world_pose = Transform(pose.rotation,
                                   np.asarray(pose.translation) + BBOX_MIN)
            label, _ = world.execute_grasp(world_pose, width)
            logger.log_grasp(round_id, (world_pose, width), scores[i],
                             label, t_int, t_plan)
            n_grasp += 1
            consecutive_failures = (0 if label == Label.SUCCESS
                                    else consecutive_failures + 1)
    return compute_metrics(logdir)


def compute_metrics(logdir: str):
    """Success rate / percent cleared / first-grasp SR / planning time
    (ref stat_expresult.py:88-113, clutter_removal.py:235-249)."""
    rounds, grasps = [], []
    with open(os.path.join(logdir, "rounds.csv")) as f:
        rounds = list(csv.DictReader(f))
    with open(os.path.join(logdir, "grasps.csv")) as f:
        grasps = list(csv.DictReader(f))
    if not grasps:
        return {"success_rate": 0.0, "percent_cleared": 0.0,
                "first_grasp_sr": 0.0, "planning_time": 0.0,
                "n_rounds": len(rounds), "n_grasps": 0}
    labels = np.array([int(g["label"]) for g in grasps])
    by_round: dict = {}
    for g in grasps:
        by_round.setdefault(g["round_id"], []).append(int(g["label"]))
    cleared = []
    for r in rounds:
        labs = by_round.get(r["round_id"], [])
        cleared.append(sum(labs) / max(int(r["object_count"]), 1))
    first = [labs[0] for labs in by_round.values() if labs]
    return {
        "success_rate": 100.0 * labels.mean(),
        "percent_cleared": 100.0 * float(np.mean(cleared)) if cleared else 0.0,
        "first_grasp_sr": 100.0 * float(np.mean(first)) if first else 0.0,
        "planning_time": float(np.mean([float(g["planning_time"])
                                        for g in grasps])),
        "n_rounds": len(rounds),
        "n_grasps": len(grasps),
    }
