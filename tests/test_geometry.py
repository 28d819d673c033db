"""Golden parity tests: graspnerf_tpu.ops.geometry vs the PyTorch reference."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from graspnerf_tpu.ops import geometry as G
from ref_harness import load_reference_nr, rand_cameras

ref = load_reference_nr()


@pytest.fixture(scope="module")
def cams():
    rng = np.random.RandomState(3)
    poses, Ks = rand_cameras(rng, 6, 96, 128)
    return poses, Ks


def test_coords2rays(cams):
    poses, Ks = cams
    rng = np.random.RandomState(0)
    coords = rng.uniform(0, 127, (6, 17, 2)).astype(np.float32)
    c_ref, d_ref = ref.render_ops.coords2rays(
        torch.from_numpy(coords), torch.from_numpy(poses), torch.from_numpy(Ks))
    c, d = G.coords2rays(jnp.asarray(coords), jnp.asarray(poses), jnp.asarray(Ks))
    np.testing.assert_allclose(np.asarray(c), c_ref.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), d_ref.numpy(), rtol=1e-5, atol=1e-5)


def test_depth2points(cams):
    poses, Ks = cams
    rng = np.random.RandomState(1)
    coords = rng.uniform(0, 90, (2, 9, 2)).astype(np.float32)
    depth = rng.uniform(0.2, 0.8, (2, 9, 5)).astype(np.float32)
    info = {"coords": torch.from_numpy(coords), "poses": torch.from_numpy(poses[:2]),
            "Ks": torch.from_numpy(Ks[:2])}
    p_ref, dir_ref = ref.render_ops.depth2points(info, torch.from_numpy(depth))
    p, d = G.depth2points(jnp.asarray(coords), jnp.asarray(poses[:2]),
                          jnp.asarray(Ks[:2]), jnp.asarray(depth))
    np.testing.assert_allclose(np.asarray(p), p_ref.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), dir_ref.numpy(), rtol=1e-5, atol=1e-5)


def test_sample_depth_deterministic():
    depth_range = np.array([[0.2, 0.8]], np.float32)
    d_ref, _ = ref.render_ops.sample_depth(
        torch.from_numpy(depth_range), torch.zeros(1, 7, 2), 40, False)
    d = G.sample_depth(jnp.asarray(depth_range), 7, 40, key=None)
    np.testing.assert_allclose(np.asarray(d), d_ref.numpy(), rtol=1e-5, atol=1e-6)


def test_depth2inv_dists():
    rng = np.random.RandomState(2)
    depth = np.sort(rng.uniform(0.2, 0.8, (1, 5, 12)).astype(np.float32), -1)
    depth_range = np.array([[0.2, 0.8]], np.float32)
    out_ref = ref.render_ops.depth2inv_dists(torch.from_numpy(depth), torch.from_numpy(depth_range))
    out = G.depth2inv_dists(jnp.asarray(depth), jnp.asarray(depth_range))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=1e-5, atol=1e-6)


def test_sample_fine_depth_deterministic():
    rng = np.random.RandomState(4)
    depth = np.sort(rng.uniform(0.2, 0.8, (1, 11, 16)).astype(np.float32), -1)
    hit = rng.uniform(0, 1, (1, 11, 16)).astype(np.float32)
    depth_range = np.array([[0.2, 0.8]], np.float32)
    out_ref = ref.render_ops.sample_fine_depth(
        torch.from_numpy(depth), torch.from_numpy(hit), torch.from_numpy(depth_range),
        8, False)
    out = G.sample_fine_depth(jnp.asarray(depth), jnp.asarray(hit),
                              jnp.asarray(depth_range), 8, key=None)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_project_points(cams):
    poses, Ks = cams
    rng = np.random.RandomState(5)
    pts = rng.uniform(-0.2, 0.2, (233, 3)).astype(np.float32)
    imgs = torch.zeros(6, 3, 96, 128)
    info = {"poses": torch.from_numpy(poses), "Ks": torch.from_numpy(Ks), "imgs": imgs}
    dir_ref, pts_ref, depth_ref, valid_ref = ref.render_ops.project_points_ref_views(
        info, torch.from_numpy(pts))
    xy, depth, valid = G.project_points(jnp.asarray(pts), jnp.asarray(poses),
                                        jnp.asarray(Ks), 96, 128)
    d = G.view_directions(jnp.asarray(pts), jnp.asarray(poses))
    np.testing.assert_allclose(np.asarray(xy), pts_ref.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth), depth_ref.numpy()[..., 0], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(valid), valid_ref.numpy())
    np.testing.assert_allclose(np.asarray(d), dir_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_alpha2hit_prob():
    rng = np.random.RandomState(6)
    alpha = rng.uniform(0, 1, (2, 7, 10)).astype(np.float32)
    out_ref = ref.render_ops.alpha_values2hit_prob(torch.from_numpy(alpha))
    out = G.alpha2hit_prob(jnp.asarray(alpha))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=1e-5, atol=1e-6)


def test_near_far_bounds():
    rng = np.random.RandomState(7)
    depth = rng.uniform(0.1, 1.0, (6, 1, 5, 8)).astype(np.float32)
    interval = rng.uniform(0.01, 0.05, (1, 1, 5, 8)).astype(np.float32)
    depth_range = np.tile(np.array([[0.2, 0.8]], np.float32), (6, 1))
    n_ref, f_ref = ref.dist_decoder.get_near_far_points(
        torch.from_numpy(depth), torch.from_numpy(interval), torch.from_numpy(depth_range), True)
    n, f = G.near_far_bounds_ref(jnp.asarray(depth), jnp.asarray(interval),
                                 jnp.asarray(depth_range))
    np.testing.assert_allclose(np.asarray(n), n_ref.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f), f_ref.numpy(), rtol=1e-5, atol=1e-6)
