"""Grasp planner API (ref: src/nr/main.py:86-253 GraspNeRFPlanner).

Given 6 RGB views + cameras, predicts the TSDF volume and grasp volumes with
one jitted call, post-processes on-device (postprocess.py) and returns metric
grasps. File-contract helpers read the reference's rendered_results layout
(rgb/%04d.png + camera_pose.npy with the blender→opencv flip).
"""
from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..models import GraspNeRF
from .postprocess import (process, nms, extract_candidates,
                          candidates_to_grasps)

BLENDER2OPENCV = np.array([[1, 0, 0, 0], [0, -1, 0, 0],
                           [0, 0, -1, 0], [0, 0, 0, 1]], np.float32)
DEFAULT_BBOX_MIN = np.array([-0.15, -0.15, -0.0503], np.float32)
VOXEL_SIZE = 0.3 / 40


def load_checkpoint_params(ckpt_dir: str):
    """Load planner params from an Orbax checkpoint directory — either a
    trainer CheckpointManager step dir / `latest` symlink (payload
    {"state": {"params", "opt_state"}, "step", "best"}) or a converted
    reference checkpoint (scripts/convert_checkpoint.py — same layout minus
    opt_state). Raw (abstract-free) restore so both layouts load through one
    path; mirrors ref main.py:152-157 loading model_best.pth."""
    import os
    import orbax.checkpoint as ocp
    path = os.path.realpath(ckpt_dir)
    restored = ocp.PyTreeCheckpointer().restore(path)
    state = restored.get("state", restored)
    return state["params"]


class GraspNeRFPlanner:
    """Inference-only planner. Params come from an Orbax checkpoint (train
    pipeline) or a converted reference checkpoint (scripts/convert_checkpoint);
    both load via `load_checkpoint_params`.
    """

    def __init__(self, params, renderer_cfg: Optional[dict] = None,
                 tsdf_thres_high: float = 0.0, tsdf_thres_low: float = -0.85,
                 qual_threshold: float = 0.90, max_candidates: int = 64,
                 seed: int = 0):
        cfg = dict(renderer_cfg or {})
        cfg.setdefault("render_rgb", False)   # ref main.py:150
        cfg.setdefault("use_depth_loss", False)
        self.model = GraspNeRF(renderer_cfg=cfg)
        self.params = params
        self.tsdf_thres = (tsdf_thres_high, tsdf_thres_low)
        self.qual_threshold = qual_threshold
        self.max_candidates = max_candidates
        self.seed = seed

        # Two-stage jit: per-scene view encoding, then volume query + grasp
        # head + on-device post-processing — matching the serving shape
        # (encode once per scene, query per planning call). (A round-4 note
        # blamed a compile blowup on the fused graph; round 5 established the
        # single graph also compiles in ~25 s — the split stays for the
        # serving-shape reason only.)
        def _encode(params, imgs):
            return self.model.apply(
                {"params": params}, {"imgs": imgs},
                method=lambda m, ref: m.nr_net.encode_views(ref))

        def _volume(params, ref, img_feats, ray_feats):
            vol = self.model.apply(
                {"params": params}, ref, img_feats, ray_feats,
                method=lambda m, ref, a, b: m.nr_net.sample_volume(ref, a, b))
            qual, rot, width = self.model.apply(
                {"params": params}, vol[None, ..., None],
                method=lambda m, v: m.vgn_net(v))
            q = process(vol, qual[0, ..., 0], width[0, ..., 0],
                        tsdf_thres_high=tsdf_thres_high,
                        tsdf_thres_low=tsdf_thres_low)
            sparse = nms(q, qual_threshold)
            cand = extract_candidates(sparse, rot[0], width[0, ..., 0],
                                      k=max_candidates)
            return vol, cand
        self._encode = jax.jit(_encode)
        self._volume = jax.jit(_volume)

    def core(self, images, extrinsics, Ks, depth_range,
             bbox_min=DEFAULT_BBOX_MIN):
        """images [V,h,w,3] in [0,1]; extrinsics [V,3,4] world→cam; Ks [V,3,3];
        depth_range [V,2]. Returns (tsdf volume [res]^3, GraspCandidates, dt).
        """
        V, h, w, _ = images.shape
        assert h % 32 == 0 and w % 32 == 0, (h, w)
        ref = {
            "imgs": jnp.asarray(images, jnp.float32),
            "poses": jnp.asarray(extrinsics, jnp.float32),
            "Ks": jnp.asarray(Ks, jnp.float32),
            "depth_range": jnp.asarray(depth_range, jnp.float32),
            "bbox3d_min": jnp.asarray(bbox_min, jnp.float32)}
        t0 = time.time()
        img_feats, ray_feats = self._encode(self.params, ref["imgs"])
        vol, cand = self._volume(self.params, ref, img_feats, ray_feats)
        jax.block_until_ready(cand.scores)
        return vol, cand, time.time() - t0

    def __call__(self, images, extrinsics, Ks, depth_range=None,
                 round_idx: int = 0, n_grasp: int = 0):
        """Full planning call: returns (grasps [(Transform, width)], scores,
        planning_time). Random permutation seeded like the reference
        (main.py:203)."""
        V = images.shape[0]
        if depth_range is None:
            depth_range = np.tile(np.array([[0.2, 0.8]], np.float32), (V, 1))
        vol, cand, toc = self.core(images, extrinsics, Ks, depth_range)
        rng = np.random.RandomState(self.seed + round_idx + n_grasp)
        grasps, scores = candidates_to_grasps(cand, VOXEL_SIZE, rng)
        return grasps, scores, toc


def load_rendered_views(render_dir: str, camera_pose_file: str,
                        view_ids: Sequence[int], wh=(512, 288),
                        K: Optional[np.ndarray] = None):
    """Read the reference renderer's file contract (ref main.py:167-199):
    rgb/%04d.png resized to `wh`, camera_pose.npy (cam→world, blender axes) →
    world→cam OpenCV poses, and the fixed vgn_syn intrinsics."""
    from PIL import Image
    import os
    imgs, poses = [], []
    cam_poses = np.load(camera_pose_file)
    for i in view_ids:
        p = os.path.join(render_dir, "rgb", "%04d.png" % i)
        img = Image.open(p).convert("RGB").resize(wh, Image.BILINEAR)
        imgs.append(np.asarray(img, np.float32) / 255.0)
        poses.append(np.linalg.inv(cam_poses[i] @ BLENDER2OPENCV)[:3, :])
    if K is None:
        K = np.array([[892.62, 0, 639.5], [0, 892.62, 359.5], [0, 0, 1]],
                     np.float32)
        scale = wh[0] / 1280.0
        K = K.copy()
        K[:2] *= scale
    Ks = np.tile(K[None], (len(view_ids), 1, 1)).astype(np.float32)
    return (np.stack(imgs), np.stack(poses).astype(np.float32), Ks)
