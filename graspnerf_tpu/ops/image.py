"""Jittable volumetric filtering used by grasp post-processing.

The reference post-processes the grasp-quality volume on the host with scipy
(gaussian_filter / binary_dilation / maximum_filter, ref: src/nr/main.py:23-74).
Here the same operators are expressed as convolutions / windowed reductions so
the whole detect pipeline runs on-device under jit. Semantics match scipy
defaults bit-for-bit (kernel radii, border modes, even-size window origins) —
verified by tests/test_image_ops.py.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    """scipy.ndimage's truncated Gaussian kernel (normalized)."""
    x = np.arange(-radius, radius + 1)
    phi = np.exp(-0.5 / (sigma * sigma) * x ** 2)
    return (phi / phi.sum()).astype(np.float32)


def gaussian_filter_3d(vol: jnp.ndarray, sigma: float = 1.0, truncate: float = 4.0):
    """Separable 3D Gaussian blur, border mode 'nearest' (edge replicate).

    vol [D,H,W]. Matches scipy.ndimage.gaussian_filter(mode='nearest').
    """
    radius = int(truncate * sigma + 0.5)
    k = jnp.asarray(_gaussian_kernel1d(sigma, radius))

    def blur_axis(v, axis):
        v = jnp.moveaxis(v, axis, -1)
        shape = v.shape
        v = v.reshape(-1, shape[-1])
        v = jnp.pad(v, ((0, 0), (radius, radius)), mode="edge")
        v = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(v)
        return jnp.moveaxis(v.reshape(shape), -1, axis)

    for ax in range(3):
        vol = blur_axis(vol, ax)
    return vol


def binary_dilation_masked(x: jnp.ndarray, mask: jnp.ndarray, iterations: int = 2):
    """scipy.ndimage.binary_dilation with a 3D cross structuring element and a
    restriction mask: voxels outside `mask` never change state.

    x, mask: bool [D,H,W].
    """
    def dilate_cross(b):
        f = b.astype(jnp.float32)
        out = f
        for ax in range(3):
            up = jnp.roll(f, 1, axis=ax)
            dn = jnp.roll(f, -1, axis=ax)
            # roll wraps; zero the wrapped slabs to emulate zero-padded borders
            idx_first = [slice(None)] * 3
            idx_first[ax] = slice(0, 1)
            idx_last = [slice(None)] * 3
            idx_last[ax] = slice(-1, None)
            up = up.at[tuple(idx_first)].set(0.0)
            dn = dn.at[tuple(idx_last)].set(0.0)
            out = jnp.maximum(out, jnp.maximum(up, dn))
        return out > 0

    for _ in range(iterations):
        x = x | (dilate_cross(x) & mask)
    return x


def maximum_filter_3d(vol: jnp.ndarray, size: int = 4):
    """scipy.ndimage.maximum_filter(size=size) in 3D, border mode 'reflect'.

    For even sizes scipy's window at output i spans [i - size//2, i + size//2 - 1].
    """
    lo = size // 2
    hi = size - 1 - lo
    padded = jnp.pad(vol, ((lo, hi),) * 3, mode="symmetric")
    return jax.lax.reduce_window(
        padded, -jnp.inf, jax.lax.max,
        window_dimensions=(size, size, size),
        window_strides=(1, 1, 1),
        padding="VALID",
    )
