"""Native C++ ray tracer agrees with the numpy oracle and is faster."""
import time

import numpy as np
import pytest

from graspnerf_tpu.data import native
from graspnerf_tpu.data.synthetic import Scene, hemisphere_poses, intrinsics


@pytest.mark.skipif(not native.available(),
                    reason="native toolchain unavailable")
def test_native_matches_numpy(rng):
    scene = Scene(rng, 5)
    h, w = 96, 128
    K = intrinsics(h, w)
    pose = hemisphere_poses()[3]
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3)
    cam_dirs = pix @ np.linalg.inv(K).T
    R, t = pose[:3, :3], pose[:3, 3]
    eye = -R.T @ t
    dirs = cam_dirs @ R
    dirs = (dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)).astype(
        np.float32)
    origins = np.broadcast_to(eye, dirs.shape).astype(np.float32).copy()

    t_np, n_np, id_np = scene._trace_numpy(origins, dirs)
    spheres = (np.stack([np.r_[c, r] for c, r in scene.spheres])
               if scene.spheres else np.zeros((0, 4), np.float32))
    boxes = (np.stack([np.r_[lo, hi] for lo, hi in scene.boxes])
             if scene.boxes else np.zeros((0, 6), np.float32))
    t_cc, n_cc, id_cc = native.trace_rays(spheres, boxes, origins, dirs)

    # ids and hit/miss must agree everywhere except razor-thin edge cases
    agree = id_np == id_cc
    assert agree.mean() > 0.999, agree.mean()
    hit = np.isfinite(t_np) & np.isfinite(t_cc) & agree
    np.testing.assert_allclose(t_cc[hit], t_np[hit], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(n_cc[hit], n_np[hit], rtol=1e-2, atol=1e-3)


@pytest.mark.skipif(not native.available(),
                    reason="native toolchain unavailable")
def test_native_speedup(rng):
    scene = Scene(rng, 6)
    n = 288 * 512
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.tile(np.array([0.0, 0.0, 0.5], np.float32), (n, 1))
    spheres = np.stack([np.r_[c, r] for c, r in scene.spheres]) \
        if scene.spheres else np.zeros((0, 4), np.float32)
    boxes = np.stack([np.r_[lo, hi] for lo, hi in scene.boxes]) \
        if scene.boxes else np.zeros((0, 6), np.float32)

    native.trace_rays(spheres, boxes, origins, dirs)  # warm
    t0 = time.perf_counter()
    native.trace_rays(spheres, boxes, origins, dirs)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    scene._trace_numpy(origins, dirs)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)
