"""Quaternion / rotation utilities (xyzw convention, scipy-compatible).

A small pure-numpy/jnp rotation library replacing the reference's dependencies
on scipy.spatial.transform.Rotation (ref: src/gd/utils/transform.py) and
pyquaternion (ref: src/nr/network/loss.py). Works on both numpy and jnp arrays
(all ops are expressed with the array namespace of the input).
"""
from __future__ import annotations

import numpy as np


def _xp(q):
    import jax.numpy as jnp
    return jnp if type(q).__module__.startswith("jax") else np


def normalize(q):
    xp = _xp(q)
    return q / xp.linalg.norm(q, axis=-1, keepdims=True)


def quat_multiply(q1, q2):
    """Hamilton product, xyzw. Matches scipy Rotation composition r1 * r2."""
    xp = _xp(q1)
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return xp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], -1)


def quat_conjugate(q):
    xp = _xp(q)
    return xp.concatenate([-q[..., :3], q[..., 3:]], -1)


def quat_to_matrix(q):
    """Unit quaternion [..,4] xyzw -> rotation matrix [..,3,3]."""
    xp = _xp(q)
    q = normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    xw, yw, zw = x * w, y * w, z * w
    m = xp.stack([
        1 - 2 * (yy + zz), 2 * (xy - zw), 2 * (xz + yw),
        2 * (xy + zw), 1 - 2 * (xx + zz), 2 * (yz - xw),
        2 * (xz - yw), 2 * (yz + xw), 1 - 2 * (xx + yy),
    ], -1)
    return m.reshape(*q.shape[:-1], 3, 3)


def matrix_to_quat(m):
    """Rotation matrix [..,3,3] -> unit quaternion [..,4] xyzw (w >= 0).

    Branch-free Shepperd's method (safe under jit; all four candidates computed,
    the numerically best one selected by the largest diagonal combination).
    """
    xp = _xp(m)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return xp.sqrt(xp.maximum(x, 1e-12))

    qw = 0.5 * safe_sqrt(1 + tr)
    qx = 0.5 * safe_sqrt(1 + m00 - m11 - m22)
    qy = 0.5 * safe_sqrt(1 - m00 + m11 - m22)
    qz = 0.5 * safe_sqrt(1 - m00 - m11 + m22)

    c0 = xp.stack([qx, (m01 + m10) / (4 * qx), (m02 + m20) / (4 * qx), (m21 - m12) / (4 * qx)], -1)
    c1 = xp.stack([(m01 + m10) / (4 * qy), qy, (m12 + m21) / (4 * qy), (m02 - m20) / (4 * qy)], -1)
    c2 = xp.stack([(m02 + m20) / (4 * qz), (m12 + m21) / (4 * qz), qz, (m10 - m01) / (4 * qz)], -1)
    c3 = xp.stack([(m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw), (m10 - m01) / (4 * qw), qw], -1)

    cands = xp.stack([c0, c1, c2, c3], -2)  # ..,4,4
    scores = xp.stack([1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
                       1 - m00 - m11 + m22, 1 + tr], -1)
    idx = xp.argmax(scores, -1)
    q = xp.take_along_axis(cands, idx[..., None, None].repeat(4, -1) if xp is np
                           else idx[..., None, None].astype(int).repeat(4, -1), -2)[..., 0, :]
    q = normalize(q)
    return xp.where(q[..., 3:] < 0, -q, q)


def rotate_vector(q, v):
    """Rotate vectors v [..,3] by quaternions q [..,4]."""
    xp = _xp(q)
    u = q[..., :3]
    w = q[..., 3:]
    uv = xp.cross(u, v)
    return v + 2 * (w * uv + xp.cross(u, uv))


def geodesic_distance(R1, R2):
    """Angle (radians) between rotation matrices, clipped like the reference
    (ref: src/nr/utils/base_utils.py compute_geodesic_distance...)."""
    xp = _xp(R1)
    m = xp.einsum("...ij,...kj->...ik", R1, R2)
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1) / 2
    cos = xp.clip(cos, -1 + 1e-6, 1 - 1e-6)
    return xp.arccos(cos)


def rot_error_deg_symmetric(q_pred, q_gt_pair):
    """Min geodesic error (degrees) vs the two gripper-symmetric GT quats.

    q_pred [n,4], q_gt_pair [n,2,4] (xyzw). Mirrors calc_rot_error_from_qxyzw
    (ref: src/nr/utils/base_utils.py:840+).
    """
    xp = _xp(q_pred)
    Rp = quat_to_matrix(q_pred)
    e0 = geodesic_distance(quat_to_matrix(q_gt_pair[:, 0]), Rp)
    e1 = geodesic_distance(quat_to_matrix(q_gt_pair[:, 1]), Rp)
    return xp.minimum(e0, e1) * (180.0 / np.pi)


def from_axis_angle(axis, angle):
    """axis [..,3] (unit), angle [..] -> quaternion xyzw."""
    xp = _xp(axis)
    axis = xp.asarray(axis)
    angle = xp.asarray(angle, dtype=axis.dtype)
    s = xp.sin(angle / 2)
    c = xp.cos(angle / 2)
    return xp.concatenate([axis * s[..., None], c[..., None]], -1)
