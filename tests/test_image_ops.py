"""Parity: jittable volumetric filters vs scipy.ndimage (grasp post-processing)."""
import numpy as np
from scipy import ndimage

import jax.numpy as jnp

from graspnerf_tpu.ops import image as im
from graspnerf_tpu.ops import tsdf as T


def test_gaussian_filter(rng):
    vol = rng.randn(20, 20, 20).astype(np.float32)
    out_ref = ndimage.gaussian_filter(vol, sigma=1.0, mode="nearest")
    out = im.gaussian_filter_3d(jnp.asarray(vol), 1.0)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-4, atol=1e-5)


def test_binary_dilation_masked(rng):
    x = rng.rand(15, 15, 15) > 0.8
    allowed = rng.rand(15, 15, 15) > 0.3
    out_ref = ndimage.binary_dilation(x, iterations=2, mask=allowed)
    out = im.binary_dilation_masked(jnp.asarray(x), jnp.asarray(allowed), 2)
    np.testing.assert_array_equal(np.asarray(out), out_ref)


def test_maximum_filter(rng):
    vol = rng.randn(17, 17, 17).astype(np.float32)
    out_ref = ndimage.maximum_filter(vol, size=4)
    out = im.maximum_filter_3d(jnp.asarray(vol), 4)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=0, atol=0)


def test_grid_points_layout():
    # matches the reference's x-major flat voxel-center constant
    # (ref: src/nr/utils/field_utils.py:17-27)
    pts = T.grid_points()
    assert pts.shape == (64000, 3)
    np.testing.assert_allclose(pts[0], [0.00375, 0.00375, 0.00375], atol=1e-7)
    # index (x*res + y)*res + z
    np.testing.assert_allclose(
        pts[(3 * 40 + 5) * 40 + 7],
        [3 * 0.0075 + 0.00375, 5 * 0.0075 + 0.00375, 7 * 0.0075 + 0.00375], atol=1e-6)


def test_tsdf_integrator_flat_plane():
    # A camera 0.5 m above the volume looking straight down at a plane at z=0:
    # voxels well above the plane must be free space (tsdf ~ 1), voxels at the
    # plane near zero, voxels below either truncated-negative or unobserved.
    res = 40
    K = np.array([[200.0, 0, 63.5], [0, 200.0, 63.5], [0, 0, 1]], np.float32)
    # camera at (0.15, 0.15, 0.5) looking down (z cam = -z world)
    Rwc = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    t = -Rwc @ np.array([0.15, 0.15, 0.5], np.float32)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = Rwc
    ext[:3, 3] = t
    depth = np.full((128, 128), 0.5, np.float32)  # plane at world z=0
    tsdf, w = T.integrate_tsdf(jnp.asarray(depth[None]), jnp.asarray(K[None]),
                               jnp.asarray(ext[None]))
    tsdf = np.asarray(tsdf)
    w = np.asarray(w)
    center = res // 2
    assert w[center, center, res - 1] > 0  # top voxel observed
    assert tsdf[center, center, res - 1] == 1.0  # far above surface -> free
    k_surf = 0  # z just above 0 (voxel centers start at 0.00375)
    assert abs(tsdf[center, center, k_surf]) < 0.5
