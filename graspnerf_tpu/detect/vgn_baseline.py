"""Classical-TSDF VGN baseline planner (ref: src/gd/detection.py:13-57).

The non-NeRF path: fuse depth images into a TSDF with the on-device integrator
(replacing the reference's Open3D volume) and run only the 3D-CNN grasp head.
Uses the classical thresholds (tsdf_thres_high=0.5, low=1e-3) since the fused
volume is a [−1,1] classical TSDF, not a NeuS SDF.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from ..models import VGNConvNet
from ..ops.tsdf import integrate_tsdf, VOLUME_SIZE, RESOLUTION
from .postprocess import process, nms, extract_candidates, candidates_to_grasps

VOXEL_SIZE = VOLUME_SIZE / RESOLUTION


class VGNPlanner:
    """Depth-in, grasps-out baseline. params = VGNConvNet param tree."""

    def __init__(self, params, qual_threshold: float = 0.90,
                 max_candidates: int = 64, seed: int = 0):
        self.params = params
        self.model = VGNConvNet()
        self.seed = seed

        def _core(params, depth_imgs, Ks, extrinsics):
            tsdf, wgt = integrate_tsdf(depth_imgs, Ks, extrinsics)
            qual, rot, width = self.model.apply({"params": params},
                                                tsdf[None, ..., None])
            q = process(tsdf, qual[0, ..., 0], width[0, ..., 0],
                        tsdf_thres_high=0.5, tsdf_thres_low=1e-3)
            sparse = nms(q, qual_threshold)
            cand = extract_candidates(sparse, rot[0], width[0, ..., 0],
                                      k=max_candidates)
            return tsdf, cand
        self._core = jax.jit(_core)

    def __call__(self, depth_imgs, Ks, extrinsics, round_idx: int = 0,
                 n_grasp: int = 0):
        """depth_imgs [n,h,w] metric; extrinsics [n,4,4] volume-local→cam."""
        t0 = time.time()
        tsdf, cand = self._core(jnp.asarray(depth_imgs), jnp.asarray(Ks),
                                jnp.asarray(extrinsics))
        jax.block_until_ready(cand.scores)
        toc = time.time() - t0
        rng = np.random.RandomState(self.seed + round_idx + n_grasp)
        grasps, scores = candidates_to_grasps(cand, VOXEL_SIZE, rng)
        return grasps, scores, toc
