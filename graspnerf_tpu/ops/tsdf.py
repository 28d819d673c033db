"""TSDF grid constants and a jittable depth-image TSDF integrator.

Replaces two native dependencies of the reference with on-device JAX:
  - the precomputed 40^3 query-grid constant (ref: src/nr/utils/field_utils.py:12-27)
  - Open3D's C++ UniformTSDFVolume used for ground-truth TSDF fusion in the sim
    harness (ref: src/gd/perception.py:66-128)

The integrator follows the classical projective-TSDF recipe (per-view truncation
+ weight-1 running average, values normalized to [-1, 1] by the truncation
distance) which is what UniformTSDFVolume computes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

RESOLUTION = 40
VOLUME_SIZE = 0.3
VOXEL_SIZE = VOLUME_SIZE / RESOLUTION
HALF_VOXEL_SIZE = VOXEL_SIZE / 2


def grid_points(resolution: int = RESOLUTION, volume_size: float = VOLUME_SIZE) -> np.ndarray:
    """Voxel-center query points in volume-local coords, x-major flat order
    [res^3, 3] (index = (x*res + y)*res + z), matching the reference constant."""
    voxel = volume_size / resolution
    ax = (np.arange(resolution, dtype=np.float32) + 0.5) * voxel
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)  # x,y,z
    return g.reshape(-1, 3).astype(np.float32)


TSDF_SAMPLE_POINTS = grid_points()


def grid_points_device(resolution: int = RESOLUTION,
                       volume_size: float = VOLUME_SIZE) -> jnp.ndarray:
    """grid_points computed with on-device iota (same values/order).

    Use this inside jitted graphs: a numpy constant of res^3 x 3 floats would
    be embedded in the executable as a literal, which both slows compilation
    and — on remote-execution backends — gets re-materialized per call. The
    iota form compiles to three broadcasts and costs nothing.
    """
    voxel = volume_size / resolution
    shape = (resolution, resolution, resolution)
    ix = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
    iy = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
    iz = jax.lax.broadcasted_iota(jnp.float32, shape, 2)
    g = (jnp.stack([ix, iy, iz], -1) + 0.5) * voxel
    return g.reshape(-1, 3)


@functools.partial(jax.jit, static_argnames=("size", "resolution"))
def integrate_tsdf(depth_imgs, Ks, extrinsics, size: float = VOLUME_SIZE,
                   resolution: int = RESOLUTION):
    """Fuse depth images into a TSDF volume.

    depth_imgs [n,h,w] metric depth (0 = no return), Ks [n,3,3],
    extrinsics [n,4,4] world(volume-local)->camera transforms.
    Returns tsdf [res,res,res] in [-1,1] (1 = free space at/beyond truncation,
    0 = surface) and weights [res,res,res]; unobserved voxels have weight 0.
    """
    voxel = size / resolution
    sdf_trunc = 4 * voxel
    ax = (jnp.arange(resolution, dtype=jnp.float32) + 0.5) * voxel
    pts = jnp.stack(jnp.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)

    n, h, w = depth_imgs.shape

    def per_view(depth_img, K, ext):
        cam = jnp.einsum("ij,pj->pi", ext[:3, :3], pts) + ext[:3, 3]
        z = cam[:, 2]
        uv = jnp.einsum("ij,pj->pi", K, cam)
        u = uv[:, 0] / jnp.where(z == 0, 1.0, z)
        v = uv[:, 1] / jnp.where(z == 0, 1.0, z)
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        inside = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h) & (z > 0)
        d = depth_img[jnp.clip(vi, 0, h - 1), jnp.clip(ui, 0, w - 1)]
        has_depth = d > 0
        sdf = d - z
        observed = inside & has_depth & (sdf >= -sdf_trunc)
        tsdf = jnp.clip(sdf / sdf_trunc, -1.0, 1.0)
        wgt = observed.astype(jnp.float32)
        return tsdf * wgt, wgt

    tsdf_sum, w_sum = jax.vmap(per_view)(depth_imgs, Ks, extrinsics)
    tsdf_sum = tsdf_sum.sum(0)
    w_sum = w_sum.sum(0)
    tsdf = jnp.where(w_sum > 0, tsdf_sum / jnp.maximum(w_sum, 1.0), 0.0)
    shape = (resolution,) * 3
    return tsdf.reshape(shape), w_sum.reshape(shape)
