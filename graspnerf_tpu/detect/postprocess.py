"""Grasp volume post-processing, fully on-device (ref: src/nr/main.py:23-84).

The reference post-processes on the host with scipy (gaussian_filter /
binary_dilation / maximum_filter); here the same operators run under jit
(ops/image.py), so the whole planner path — volume → quality masking → NMS —
stays on the TPU and only the final argwhere touches the host.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import (gaussian_filter_3d, binary_dilation_masked,
                         maximum_filter_3d)


def process(tsdf_vol, qual_vol, width_vol, gaussian_filter_sigma: float = 1.0,
            min_width: float = 1.33, max_width: float = 9.33,
            tsdf_thres_high: float = 0.0, tsdf_thres_low: float = -0.85):
    """Smooth quality, zero voxels far from the predicted surface and with
    out-of-range widths. All [res,res,res]. SDF-mode thresholds (high=0,
    low=-0.85) per ref main.py:92-93; classical-TSDF mode uses (0.5, 1e-3).
    """
    qual = gaussian_filter_3d(qual_vol, gaussian_filter_sigma)
    outside = tsdf_vol > tsdf_thres_high
    inside = (tsdf_thres_low < tsdf_vol) & (tsdf_vol < tsdf_thres_high)
    valid = binary_dilation_masked(outside, ~inside, iterations=2)
    qual = jnp.where(valid, qual, 0.0)
    qual = jnp.where((width_vol < min_width) | (width_vol > max_width),
                     0.0, qual)
    return qual


def nms(qual_vol, threshold: float = 0.90, max_filter_size: int = 4):
    """Threshold + cubic max-filter NMS; returns the sparse quality volume."""
    qual = jnp.where(qual_vol < threshold, 0.0, qual_vol)
    max_vol = maximum_filter_3d(qual, max_filter_size)
    return jnp.where(qual == max_vol, qual, 0.0)


class GraspCandidates(NamedTuple):
    """Top-K candidates with static shapes (device-friendly). Invalid slots
    have score 0."""
    indices: jnp.ndarray  # [K,3] int32 voxel coords
    scores: jnp.ndarray   # [K]
    rotations: jnp.ndarray  # [K,4] xyzw
    widths: jnp.ndarray   # [K]


import functools


@functools.partial(jax.jit, static_argnames=("k",))
def extract_candidates(qual_sparse, rot_vol, width_vol,
                       k: int = 64) -> GraspCandidates:
    """Static top-K over the NMS volume (replaces the host argwhere loop,
    ref main.py:66-74)."""
    res = qual_sparse.shape[0]
    flat = qual_sparse.reshape(-1)
    scores, idx = jax.lax.top_k(flat, k)
    iz = idx % res
    iy = (idx // res) % res
    ix = idx // (res * res)
    indices = jnp.stack([ix, iy, iz], -1).astype(jnp.int32)
    rotations = rot_vol.reshape(-1, 4)[idx]
    widths = width_vol.reshape(-1)[idx]
    return GraspCandidates(indices, scores, rotations, widths)


def candidates_to_grasps(cand: GraspCandidates, voxel_size: float = 0.3 / 40,
                         rng: np.random.RandomState | None = None):
    """Host side: drop empty slots, optionally shuffle (ref main.py:202-208),
    convert voxel→metric. Returns (grasps, scores) where each grasp is a
    (Transform, width) pair."""
    from ..sim.transform import Transform, Rotation
    scores = np.asarray(cand.scores)
    keep = scores > 0
    idx = np.asarray(cand.indices)[keep]
    rots = np.asarray(cand.rotations)[keep]
    widths = np.asarray(cand.widths)[keep]
    scores = scores[keep]
    order = np.arange(len(scores))
    if rng is not None and len(order):
        order = rng.permutation(len(order))
    grasps = []
    for i in order:
        pose = Transform(Rotation.from_quat(rots[i]),
                         idx[i].astype(np.float64) * voxel_size)
        grasps.append((pose, float(widths[i] * voxel_size)))
    return grasps, scores[order]
