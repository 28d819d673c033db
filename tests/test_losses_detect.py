"""Parity tests: training losses vs the reference loss classes, and the
detect post-processing pipeline vs the reference's scipy implementation."""
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

import graspnerf_tpu.train.losses as L
from graspnerf_tpu.detect import process, nms, extract_candidates
from ref_harness import load_reference_nr

ATOL = 1e-5


def _stub_loss_deps():
    for name in ("torchmetrics", "pyquaternion"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            if name == "pyquaternion":
                m.Quaternion = object
            sys.modules[name] = m
    if "torchmetrics" in sys.modules and not hasattr(
            sys.modules["torchmetrics"], "functional"):
        sys.modules["torchmetrics"].functional = types.SimpleNamespace()


@pytest.fixture(scope="module")
def ref_losses():
    load_reference_nr()
    _stub_loss_deps()
    import network.loss as loss
    return loss


def test_render_loss_parity(ref_losses, rng):
    import torch
    rn = 64
    out = {
        "pixel_colors_gt": rng.rand(1, rn, 3).astype(np.float32),
        "pixel_colors_nr": rng.rand(1, rn, 3).astype(np.float32),
        "pixel_colors_nr_fine": rng.rand(1, rn, 3).astype(np.float32),
        "ray_mask": rng.rand(1, rn) > 0.3,
    }
    out["ray_mask_fine"] = out["ray_mask"]
    mine = L.render_loss({k: jnp.asarray(v) for k, v in out.items()})
    tl = ref_losses.RenderLoss({"use_nr_fine_loss": True})
    tout = {k: torch.from_numpy(np.asarray(v)) for k, v in out.items()}
    ref = tl(tout, {}, 0, is_train=True)
    np.testing.assert_allclose(float(mine["loss_rgb_nr"]),
                               float(ref["loss_rgb_nr"].sum()), atol=ATOL)
    np.testing.assert_allclose(float(mine["loss_rgb_nr_fine"]),
                               float(ref["loss_rgb_nr_fine"].sum()), atol=ATOL)


def test_sdf_loss_parity(ref_losses, rng):
    import torch
    res = 16
    vol = (rng.rand(res, res, res).astype(np.float32) - 0.5) * 2
    gt = (rng.rand(res, res, res).astype(np.float32) - 0.5) * 2
    gt[rng.rand(res, res, res) < 0.3] = -1.0
    grad_err = rng.rand(1, 1).astype(np.float32)
    s = np.array([[0.3]], np.float32)
    mine = L.sdf_loss({"volume": jnp.asarray(vol),
                       "sdf_gradient_error": jnp.asarray(grad_err),
                       "s": jnp.asarray(s)}, jnp.asarray(gt))
    tl = ref_losses.SDFLoss({})
    ref = tl({"volume": torch.from_numpy(vol)[None, None],
              "sdf_gradient_error": torch.from_numpy(grad_err),
              "s": torch.from_numpy(s)},
             {"ref_imgs_info": {"sdf_gt": torch.from_numpy(gt)}}, 0)
    np.testing.assert_allclose(float(mine["loss_sdf"]),
                               float(ref["loss_sdf"]), atol=ATOL)
    np.testing.assert_allclose(float(mine["loss_eikonal"]),
                               float(ref["loss_eikonal"]), atol=ATOL)
    np.testing.assert_allclose(float(mine["sdf_mae"]),
                               float(ref["sdf_mae"]), atol=1e-4)


def test_vgn_loss_parity(ref_losses, rng):
    import torch
    n = 32
    qual = rng.rand(n).astype(np.float32)
    rot = rng.randn(n, 4).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
    width = rng.rand(n).astype(np.float32) * 8
    label = (rng.rand(n) > 0.5).astype(np.float32)
    gt_rot = rng.randn(n, 2, 4).astype(np.float32)
    gt_rot /= np.linalg.norm(gt_rot, axis=-1, keepdims=True)
    gt_width = rng.rand(n).astype(np.float32) * 8

    mine = L.vgn_loss({"vgn_pred": (jnp.asarray(qual), jnp.asarray(rot),
                                    jnp.asarray(width))},
                      jnp.asarray(label), jnp.asarray(gt_rot),
                      jnp.asarray(gt_width))
    tl = ref_losses.VGNLoss({})
    pred = (torch.from_numpy(qual), torch.from_numpy(rot),
            torch.from_numpy(width))
    gt = (None, torch.from_numpy(label), torch.from_numpy(gt_rot),
          torch.from_numpy(gt_width))
    ref = tl({"vgn_pred": pred}, {"grasp_info": gt}, 0)
    for k in ("loss_vgn", "vgn_total_loss", "vgn_qual_loss", "vgn_rot_loss",
              "vgn_width_loss", "vgn_qual_acc", "vgn_rot_err"):
        np.testing.assert_allclose(float(mine[k]), float(np.asarray(ref[k])),
                                   atol=1e-3, err_msg=k)


def test_depth_loss_parity(ref_losses, rng):
    import torch
    V, h, w, pn = 3, 16, 24, 50
    coords = np.stack([rng.uniform(0, w - 1, (V, pn)),
                       rng.uniform(0, h - 1, (V, pn))], -1).astype(np.float32)
    depth_mean = rng.rand(V, pn).astype(np.float32)
    true_depth = (rng.rand(V, h, w, 1).astype(np.float32) * 0.6 + 0.2)
    dr = np.tile(np.array([[0.2, 0.8]], np.float32), (V, 1))
    mine = L.depth_loss({"depth_coords": jnp.asarray(coords),
                         "depth_mean": jnp.asarray(depth_mean)},
                        jnp.asarray(true_depth), jnp.asarray(dr))
    tl = ref_losses.DepthLoss({})
    ref = tl({"depth_coords": torch.from_numpy(coords),
              "depth_mean": torch.from_numpy(depth_mean),
              "pixel_colors_nr": torch.zeros(1)},
             {"ref_imgs_info": {
                 "true_depth": torch.from_numpy(
                     np.moveaxis(true_depth, -1, 1)),
                 "depth_range": torch.from_numpy(dr)},
              "scene_name": "vgn_syn/x"}, 0)
    np.testing.assert_allclose(float(mine["loss_depth"]),
                               float(ref["loss_depth"]), atol=ATOL)


def test_process_and_nms_vs_scipy(rng):
    from scipy import ndimage
    res = 40
    tsdf = (rng.rand(res, res, res).astype(np.float32) - 0.5) * 2
    qual = rng.rand(res, res, res).astype(np.float32)
    width = rng.rand(res, res, res).astype(np.float32) * 12

    mine = np.asarray(process(jnp.asarray(tsdf), jnp.asarray(qual),
                              jnp.asarray(width)))

    q = ndimage.gaussian_filter(qual, sigma=1.0, mode="nearest")
    outside = tsdf > 0.0
    inside = np.logical_and(-0.85 < tsdf, tsdf < 0.0)
    valid = ndimage.binary_dilation(outside, iterations=2,
                                    mask=np.logical_not(inside))
    q[valid == False] = 0.0  # noqa: E712
    q[np.logical_or(width < 1.33, width > 9.33)] = 0.0
    np.testing.assert_allclose(mine, q, atol=1e-5)

    sparse = np.asarray(nms(jnp.asarray(mine), 0.5))
    max_vol = ndimage.maximum_filter(np.where(q < 0.5, 0.0, q), size=4)
    expected = np.where(np.where(q < 0.5, 0.0, q) == max_vol,
                        np.where(q < 0.5, 0.0, q), 0.0)
    np.testing.assert_allclose(sparse, expected, atol=1e-5)

    rot = rng.rand(res, res, res, 4).astype(np.float32)
    n_true = int((expected > 0).sum())
    cand = extract_candidates(jnp.asarray(sparse), jnp.asarray(rot),
                              jnp.asarray(width), k=max(64, n_true))
    got = {tuple(i) for i, s in zip(np.asarray(cand.indices),
                                    np.asarray(cand.scores)) if s > 0}
    want = {tuple(i) for i in np.argwhere(expected > 0)}
    assert got == want


def test_total_loss_sums_only_loss_keys():
    d = {"loss_a": jnp.asarray(1.0), "loss_b": jnp.asarray(2.0),
         "vgn_qual_acc": jnp.asarray(50.0), "sdf_mae": jnp.asarray(0.2)}
    assert float(L.total_loss(d)) == 3.0
