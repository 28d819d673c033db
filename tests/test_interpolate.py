"""Parity: interpolate/resize ops vs torch grid_sample / F.interpolate."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from graspnerf_tpu.ops import interpolate as I
from ref_harness import load_reference_nr

ref = load_reference_nr()


def _rand_case(rng, B=3, H=24, W=32, C=5, N=101, fh=None, fw=None):
    fh, fw = fh or H, fw or W
    feats = rng.randn(B, C, fh, fw).astype(np.float32)
    # include coords slightly out of range to exercise padding
    pts = np.stack([
        rng.uniform(-3, W + 2, (B, N)).astype(np.float32),
        rng.uniform(-3, H + 2, (B, N)).astype(np.float32),
    ], -1)
    return feats, pts


def test_interpolate_feats_matches_grid_sample(rng):
    for align in (False, True):
        for pad in ("zeros", "border"):
            feats, pts = _rand_case(rng)
            out_ref = ref.ops.interpolate_feats(
                torch.from_numpy(feats), torch.from_numpy(pts), 24, 32, pad, align)
            out = I.interpolate_feats(
                jnp.asarray(feats.transpose(0, 2, 3, 1)), jnp.asarray(pts),
                24, 32, pad, align)
            np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"align={align} pad={pad}")


def test_interpolate_downsampled_map(rng):
    # coords in full-res units, map at quarter res (the encoder-feature case)
    feats, pts = _rand_case(rng, fh=6, fw=8)
    mask = (rng.rand(3, 101) > 0.3).astype(np.float32)
    out_ref = ref.render_ops.interpolate_feature_map(
        torch.from_numpy(feats), torch.from_numpy(pts),
        torch.from_numpy(mask), 24, 32)
    out = I.interpolate_feature_map(
        jnp.asarray(feats.transpose(0, 2, 3, 1)), jnp.asarray(pts),
        jnp.asarray(mask), 24, 32)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_resize_bilinear_align_corners(rng):
    x = rng.randn(2, 4, 9, 13).astype(np.float32)
    out_ref = F.interpolate(torch.from_numpy(x), scale_factor=2,
                            mode="bilinear", align_corners=True)
    out = I.resize_bilinear_align_corners(jnp.asarray(x.transpose(0, 2, 3, 1)), 18, 26)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               out_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_resize_nearest_3d(rng):
    x = rng.randn(1, 7, 5, 5, 5).astype(np.float32)
    for size in (10, 20):
        out_ref = F.interpolate(torch.from_numpy(x), size)
        out = I.resize_nearest_3d(jnp.asarray(np.moveaxis(x, 1, -1)), size, size, size)
        np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1),
                                   out_ref.numpy(), rtol=0, atol=0)
