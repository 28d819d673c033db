"""Ray/camera geometry and depth-sampling primitives (pure jnp, jit-safe).

Behavioral parity targets (checked by tests/test_geometry.py against the PyTorch
reference run on CPU):
  - ray generation from pixel coords + world->cam extrinsics
    (ref: src/nr/network/render_ops.py:4-39)
  - inverse-depth stratified sampling and hierarchical CDF resampling
    (ref: src/nr/network/render_ops.py:146-229)
  - point projection into source views with validity masks
    (ref: src/nr/network/render_ops.py:82-130)
  - alpha -> hit-probability transmittance compositing
    (ref: src/nr/network/render_ops.py:72-80)
  - inverse-depth normalization / per-sample near-far bounds
    (ref: src/nr/network/dist_decoder.py:6-51)

Everything here is static-shape and batched: no data-dependent Python control
flow, so it all fuses under jit and maps cleanly onto the TPU VPU/MXU.

Conventions: `poses` are world->camera [.., 3, 4] (OpenCV convention), `Ks` are
pinhole intrinsics [.., 3, 3], pixel coords are (x, y) in full-resolution units.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Rays
# ---------------------------------------------------------------------------

def camera_centers(poses: jnp.ndarray) -> jnp.ndarray:
    """World-space camera centers -R^T t for world->cam poses [..,3,4] -> [..,3]."""
    rot = poses[..., :3, :3]
    t = poses[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", rot, t)


def coords2rays(coords: jnp.ndarray, poses: jnp.ndarray, Ks: jnp.ndarray):
    """Pixel coords -> (ray centers, unnormalized directions).

    coords [qn,rn,2] (x,y), poses [qn,3,4], Ks [qn,3,3]
    returns centers [qn,rn,3], directions [qn,rn,3] where a point at depth d is
    center + d * direction (direction has unit z-depth in camera frame).
    """
    qn, rn, _ = coords.shape
    centers = camera_centers(poses)  # qn,3
    hom = jnp.concatenate([coords, jnp.ones((qn, rn, 1), coords.dtype)], -1)  # qn,rn,3
    Ks_inv = jnp.linalg.inv(Ks)  # qn,3,3
    cam_dirs = jnp.einsum("qij,qrj->qri", Ks_inv, hom)  # qn,rn,3 (camera frame)
    rot_t = jnp.swapaxes(poses[..., :3, :3], -1, -2)  # R^T
    directions = jnp.einsum("qij,qrj->qri", rot_t, cam_dirs)  # world frame
    centers = jnp.broadcast_to(centers[:, None, :], (qn, rn, 3))
    return centers, directions


def rays_at_depth(centers, directions, depth):
    """Points along rays: centers/directions [qn,rn,3], depth [qn,rn,dn] -> [qn,rn,dn,3]."""
    return centers[:, :, None, :] + directions[:, :, None, :] * depth[..., None]


def depth2points(coords, poses, Ks, depth):
    """Rays + depths -> (points [qn,rn,dn,3], per-ray unit view dirs [qn,rn,dn,3]).

    The view direction points from the scene towards the camera (negated ray
    direction), matching the reference renderer's convention.
    """
    centers, directions = coords2rays(coords, poses, Ks)
    pts = rays_at_depth(centers, directions, depth)
    norm = jnp.linalg.norm(directions, axis=-1, keepdims=True)
    que_dir = -directions / norm
    dn = depth.shape[-1]
    que_dir = jnp.broadcast_to(que_dir[:, :, None, :], (*depth.shape[:2], dn, 3))
    return pts, que_dir


# ---------------------------------------------------------------------------
# Depth parameterization
# ---------------------------------------------------------------------------

def depth2dists(depth: jnp.ndarray) -> jnp.ndarray:
    """Forward differences with a 1e6 sentinel at the far end. [...,dn]->[...,dn]."""
    dists = depth[..., 1:] - depth[..., :-1]
    last = jnp.full((*depth.shape[:-1], 1), 1e6, depth.dtype)
    return jnp.concatenate([dists, last], -1)


def to_inv_norm(depth, depth_range):
    """Map metric depth to normalized inverse-depth in [0,1].

    depth [...,dn] (leading axis matches depth_range's), depth_range [q,2].
    u = (-1/d - (-1/near)) / ((-1/far) - (-1/near))
    """
    near = -1.0 / depth_range[:, 0]
    far = -1.0 / depth_range[:, 1]
    shape = (-1,) + (1,) * (depth.ndim - 1)
    near = near.reshape(shape)
    far = far.reshape(shape)
    return (-1.0 / depth - near) / (far - near)


def from_inv_norm(u, depth_range):
    """Inverse of to_inv_norm (scalar near/far from first row, as the reference)."""
    near, far = -1.0 / depth_range[0, 0], -1.0 / depth_range[0, 1]
    return -1.0 / (u * (far - near) + near)


def depth2inv_dists(depth, depth_range):
    """Sample-interval widths in normalized inverse-depth space. [qn,rn,dn]."""
    return depth2dists(to_inv_norm(depth, depth_range))


def sample_depth(depth_range, rn: int, dn: int, key=None):
    """Stratified inverse-depth sampling: dn samples/ray over [near, far].

    depth_range [qn,2]. Deterministic midpoints when key is None (eval), else
    jittered. Returns depth [qn,rn,dn].
    """
    qn = depth_range.shape[0]
    near, far = depth_range[:, 0], depth_range[:, 1]
    interval = (1.0 / far - 1.0 / near) / (dn - 1)  # qn
    val = jnp.arange(1, dn - 1, dtype=jnp.float32)[None, None, :]
    val = jnp.broadcast_to(val, (qn, rn, dn - 2))
    if key is not None:
        val = val + (jax.random.uniform(key, (qn, rn, dn - 2)) - 0.5) * 0.999
    ticks = interval[:, None, None] * val
    diff = (1.0 / far - 1.0 / near)
    zeros = jnp.zeros((qn, rn, 1), jnp.float32)
    last = jnp.broadcast_to(diff[:, None, None], (qn, rn, 1))
    ticks = jnp.concatenate([zeros, ticks, last], -1)
    return 1.0 / (1.0 / near[:, None, None] + ticks)


def sample_fine_depth(depth, hit_prob, depth_range, fdn: int, key=None):
    """Hierarchical resampling: invert the per-ray hit-prob CDF in inverse-depth space.

    depth/hit_prob [qn,rn,dn], depth_range [qn,2] -> fine depth [qn,rn,fdn]
    (unsorted; callers sort). Static shapes; searchsorted is vectorized.
    """
    near, far = -1.0 / depth_range[0, 0], -1.0 / depth_range[0, 1]
    depth_u = (-1.0 / depth - near) / (far - near)  # normalized inverse depth

    mid = (depth_u[..., 1:] + depth_u[..., :-1]) * 0.5
    bins = jnp.concatenate([depth_u[..., :1], mid, depth_u[..., -1:]], -1)  # dn+1

    hit_prob = hit_prob + 1e-5
    pdf = hit_prob / jnp.sum(hit_prob, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # dn+1... (dn)

    if key is None:
        u = (jnp.arange(fdn, dtype=jnp.float32) + 0.5) / fdn
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], fdn))
    else:
        u = jax.random.uniform(key, (*cdf.shape[:-1], fdn))

    # searchsorted(side="right") == count of cdf entries <= u; the broadcast
    # compare+reduce runs on the VPU in one fused pass (the double-vmapped
    # jnp.searchsorted lowered to a slow per-ray sort-based scan on TPU)
    inds = jnp.sum((cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32),
                   -1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, -1)
    cdf_a = jnp.take_along_axis(cdf, above, -1)
    bins_b = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), -1)
    bins_a = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), -1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    fine_u = bins_b + t * (bins_a - bins_b)
    return -1.0 / (fine_u * (far - near) + near)


# ---------------------------------------------------------------------------
# Projection into source views
# ---------------------------------------------------------------------------

def project_points(pts, poses, Ks, h: int, w: int):
    """Project world points into each source view.

    pts [P,3], poses [rfn,3,4], Ks [rfn,3,3] -> (coords [rfn,P,2] pixel xy,
    depth [rfn,P], valid [rfn,P] bool). Valid = in front of camera and inside
    the image rectangle [-0.5, size-0.5) (matches the reference's bounds).
    """
    KRt = jnp.einsum("vij,vjk->vik", Ks, poses)  # rfn,3,4
    cam = jnp.einsum("vik,pk->vpi", KRt[..., :3], pts) + KRt[..., 3][:, None, :]
    depth = cam[..., 2]
    depth_invalid = jnp.abs(depth) < 1e-4
    safe_depth = jnp.where(depth_invalid, 1e-3, depth)
    xy = cam[..., :2] / safe_depth[..., None]
    inside = (
        (xy[..., 0] >= -0.5) & (xy[..., 0] < w - 0.5)
        & (xy[..., 1] >= -0.5) & (xy[..., 1] < h - 0.5)
    )
    valid = (~depth_invalid) & inside
    return xy, safe_depth, valid


def view_directions(pts, poses):
    """Unit direction from each point towards each source camera. [rfn,P,3]."""
    centers = camera_centers(poses)  # rfn,3
    d = pts[None, :, :] - centers[:, None, :]
    d = -d / jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-5)
    return d


# ---------------------------------------------------------------------------
# Compositing
# ---------------------------------------------------------------------------

def alpha2hit_prob(alpha: jnp.ndarray) -> jnp.ndarray:
    """alpha [...,dn] -> per-sample hit probability via cumulative transmittance."""
    trans = jnp.cumprod(1.0 - alpha + 1e-10, -1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], -1)
    return alpha * trans


def composite(hit_prob, values):
    """Weighted sum along the sample axis: hit_prob [...,dn], values [...,dn,c]."""
    return jnp.sum(hit_prob[..., None] * values, -2)


# ---------------------------------------------------------------------------
# Per-sample near/far bounds in normalized inverse-depth space
# ---------------------------------------------------------------------------

def near_far_bounds_ref(depth, interval, depth_range):
    """Bounds around each projected sample depth, per source view.

    depth [rfn,qn,rn,dn] metric projected depth, interval [1,qn,rn,dn] widths in
    inverse-depth space, depth_range [rfn,2]. The half-interval is extended one
    slot left so bin i spans [d_i - I_{i-1}/2, d_i + I_i/2].
    """
    near_r = (-1.0 / depth_range[:, 0])[:, None, None, None]
    far_r = (-1.0 / depth_range[:, 1])[:, None, None, None]
    d = -1.0 / jnp.clip(depth, 1e-5)
    d = (d - near_r) / (far_r - near_r)
    half = interval * 0.5
    ext = jnp.concatenate([half[..., :1], half], -1)
    return d - ext[..., :-1], d + ext[..., 1:]


def near_far_bounds_fixed(depth, depth_range, fixed_val=0.01):
    """Fixed-width bounds (used for volume queries where no ray interval exists)."""
    near_r = (-1.0 / depth_range[:, 0])[:, None, None, None]
    far_r = (-1.0 / depth_range[:, 1])[:, None, None, None]
    d = -1.0 / jnp.clip(depth, 1e-5)
    d = (d - near_r) / (far_r - near_r)
    return d - fixed_val / 2, d + fixed_val / 2
