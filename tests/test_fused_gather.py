"""Fused single-window gather vs the three-gather oracle (exactness).

The fused path (ops/fused_gather.py) must produce bit-equal values to
interpolate_feature_map on all three map kinds, including the border cases
(taps straddling the image edge, invalid projections, the half-pixel valid
band at the borders)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graspnerf_tpu.ops.interpolate import interpolate_feature_map
from graspnerf_tpu.ops.fused_gather import (pack_feature_maps,
                                            fused_epipolar_gather)
from graspnerf_tpu.models.renderer import project_to_views
from graspnerf_tpu.ops import geometry


def _mk(rng, V=3, H=64, W=96, C=8, P=500):
    imgs = rng.rand(V, H, W, 3).astype(np.float32)
    img_f = rng.rand(V, H // 4, W // 4, C).astype(np.float32)
    ray_f = rng.rand(V, H // 4, W // 4, C).astype(np.float32)
    # coords spanning in-range, the half-pixel border band, and far outside
    xy = np.stack([
        rng.uniform(-3.0, W + 2.0, (V, P)),
        rng.uniform(-3.0, H + 2.0, (V, P)),
    ], -1).astype(np.float32)
    # force exact border/edge cases
    xy[:, :8] = [[-0.49, -0.49], [W - 0.51, H - 0.51], [0.0, 0.0],
                 [W - 1.0, H - 1.0], [-0.49, H - 0.51], [0.25, -0.49],
                 [W - 1.0, 0.0], [0.5, 0.5]]
    valid = ((xy[..., 0] >= -0.5) & (xy[..., 0] < W - 0.5)
             & (xy[..., 1] >= -0.5) & (xy[..., 1] < H - 0.5))
    return imgs, img_f, ray_f, xy, valid.astype(np.float32)


def test_fused_matches_oracle(rng):
    imgs, img_f, ray_f, xy, valid = _mk(rng)
    H, W = imgs.shape[1:3]
    packed = pack_feature_maps(jnp.asarray(imgs), jnp.asarray(img_f),
                               jnp.asarray(ray_f))
    rgb, gi, gr = jax.jit(
        lambda p, c, v: fused_epipolar_gather(p, c, v, H, W))(
            packed, jnp.asarray(xy), jnp.asarray(valid))

    oracle = jax.jit(lambda m, c, v: interpolate_feature_map(m, c, v, H, W))
    o_rgb = oracle(jnp.asarray(imgs), jnp.asarray(xy), jnp.asarray(valid))
    o_img = oracle(jnp.asarray(img_f), jnp.asarray(xy), jnp.asarray(valid))
    o_ray = oracle(jnp.asarray(ray_f), jnp.asarray(xy), jnp.asarray(valid))
    # jit reassociates x/(w-1) -> x*(1/(w-1)) etc., so allow ~1 ulp of weight
    # noise; bilinear continuity bounds the effect of any floor flips
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(o_rgb),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(o_img),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(o_ray),
                               rtol=0, atol=1e-5)


def test_fused_gradients_match_oracle(rng):
    """d(output)/d(maps) must agree too — training runs through this path."""
    imgs, img_f, ray_f, xy, valid = _mk(rng, V=2, H=32, W=32, C=4, P=64)
    H, W = imgs.shape[1:3]
    xyj, vj = jnp.asarray(xy), jnp.asarray(valid)

    def fused(imgs, img_f, ray_f):
        packed = pack_feature_maps(imgs, img_f, ray_f)
        rgb, gi, gr = fused_epipolar_gather(packed, xyj, vj, H, W)
        return (jnp.sum(rgb ** 2) + jnp.sum(jnp.sin(gi))
                + jnp.sum(gr * gr * gr))

    def oracle(imgs, img_f, ray_f):
        rgb = interpolate_feature_map(imgs, xyj, vj, H, W)
        gi = interpolate_feature_map(img_f, xyj, vj, H, W)
        gr = interpolate_feature_map(ray_f, xyj, vj, H, W)
        return (jnp.sum(rgb ** 2) + jnp.sum(jnp.sin(gi))
                + jnp.sum(gr * gr * gr))

    args = (jnp.asarray(imgs), jnp.asarray(img_f), jnp.asarray(ray_f))
    gf = jax.grad(fused, argnums=(0, 1, 2))(*args)
    go = jax.grad(oracle, argnums=(0, 1, 2))(*args)
    for a, b in zip(gf, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_project_to_views_packed_equals_oracle(rng):
    """End-to-end through project_to_views with real projective geometry."""
    V, H, W = 4, 64, 96
    imgs = jnp.asarray(rng.rand(V, H, W, 3).astype(np.float32))
    img_f = jnp.asarray(rng.rand(V, H // 4, W // 4, 6).astype(np.float32))
    ray_f = jnp.asarray(rng.rand(V, H // 4, W // 4, 6).astype(np.float32))
    poses = []
    for i in range(V):
        az = 2 * np.pi * i / V
        eye = np.array([0.4 * np.cos(az), 0.4 * np.sin(az), 0.3], np.float32)
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0, 0, 1.0])
        right = np.cross(fwd, up); right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], 0)
        poses.append(np.concatenate([R, (-R @ eye)[:, None]], 1))
    poses = jnp.asarray(np.stack(poses).astype(np.float32))
    K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32)
    Ks = jnp.asarray(np.tile(K[None], (V, 1, 1)))
    ref = {"imgs": imgs, "poses": poses, "Ks": Ks}
    que_pts = jnp.asarray(
        rng.uniform(-0.25, 0.25, (1, 50, 8, 3)).astype(np.float32))

    packed = pack_feature_maps(imgs, img_f, ray_f)
    a = project_to_views(ref, que_pts, img_f, ray_f, packed)
    b = project_to_views(ref, que_pts, img_f, ray_f, None)
    assert set(a.keys()) == set(b.keys())
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=0, atol=1e-6, err_msg=k)


def test_custom_vjp_matches_oracle_grads(rng):
    """The gather's custom backward (windows re-gather + MXU one-hot splat,
    replacing XLA's serialized scatter-add) must reproduce the oracle
    three-gather path's gradients w.r.t. every input."""
    import jax
    import jax.numpy as jnp
    from graspnerf_tpu.ops.fused_gather import (pack_feature_maps,
                                                fused_epipolar_gather)
    from graspnerf_tpu.ops.interpolate import interpolate_feature_map

    V, H, W, Cf, P = 2, 32, 48, 4, 257
    imgs = jnp.asarray(rng.rand(V, H, W, 3).astype(np.float32))
    imf = jnp.asarray(rng.rand(V, H // 4, W // 4, Cf).astype(np.float32))
    rayf = jnp.asarray(rng.rand(V, H // 4, W // 4, Cf).astype(np.float32))
    xy = jnp.asarray((rng.rand(V, P, 2) * np.array([W + 8, H + 8]) - 4)
                     .astype(np.float32))
    valid = jnp.asarray((rng.rand(V, P) > 0.15).astype(np.float32))
    g_rgb = jnp.asarray(rng.randn(V, P, 3).astype(np.float32))
    g_if = jnp.asarray(rng.randn(V, P, Cf).astype(np.float32))
    g_rf = jnp.asarray(rng.randn(V, P, Cf).astype(np.float32))

    def loss_fused(imgs, imf, rayf, xy, valid):
        packed = pack_feature_maps(imgs, imf, rayf)
        rgb, a, b = fused_epipolar_gather(packed, xy, valid, H, W)
        return (jnp.sum(rgb * g_rgb) + jnp.sum(a * g_if)
                + jnp.sum(b * g_rf))

    def loss_oracle(imgs, imf, rayf, xy, valid):
        b = interpolate_feature_map(rayf, xy, valid, H, W)
        rgb = interpolate_feature_map(imgs, xy, valid, H, W)
        a = interpolate_feature_map(imf, xy, valid, H, W)
        return (jnp.sum(rgb * g_rgb) + jnp.sum(a * g_if)
                + jnp.sum(b * g_rf))

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4)))(
        imgs, imf, rayf, xy, valid)
    go = jax.jit(jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4)))(
        imgs, imf, rayf, xy, valid)
    for a, b in zip(gf, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-5)
