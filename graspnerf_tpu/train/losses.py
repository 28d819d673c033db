"""Training losses (ref: src/nr/network/loss.py), as pure jittable functions.

Each loss maps (outputs, batch) → dict of scalars; every key starting with
"loss" is summed into the total (mirroring the reference Trainer's convention,
trainer.py:147-158). Diagnostic keys (accuracy, MAE, ...) are carried alongside.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.interpolate import interpolate_feats
from ..ops import quat


def smooth_l1(pred, target, beta: float = 1.0):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def render_loss(outputs, weight: float = 0.01, use_fine: bool = True):
    """Masked L2 on ray colors, coarse + fine (ref loss.py:50-85)."""
    gt = outputs["pixel_colors_gt"]

    def one(pred, mask):
        err = jnp.sum((pred - gt) ** 2, -1)
        m = mask.astype(err.dtype)
        return weight * jnp.sum(
            jnp.sum(err * m, 1) / (jnp.sum(m, 1) + 1e-3))

    out = {"loss_rgb_nr": one(outputs["pixel_colors_nr"],
                              outputs["ray_mask"])}
    if use_fine and "pixel_colors_nr_fine" in outputs:
        out["loss_rgb_nr_fine"] = one(outputs["pixel_colors_nr_fine"],
                                      outputs["ray_mask_fine"])
    return out


def _to_inv_norm_clipped(depth, depth_range):
    near = -1.0 / depth_range[:, 0:1]
    far = -1.0 / depth_range[:, 1:2]
    d = -1.0 / jnp.clip(depth, 1e-5)
    return jnp.clip((d - near) / (far - near), 0.0, 1.0)


def depth_loss(outputs, true_depth, depth_range, weight: float = 1.0):
    """L2 in normalized inverse-depth at the sampled coords (ref loss.py:87-144).

    true_depth [V,H,W,1]; coords/depth_mean from predict_mean_for_depth_loss.
    """
    coords = outputs["depth_coords"]  # V,pn,2 (x,y)
    V, H, W, _ = true_depth.shape
    gt = interpolate_feats(true_depth, coords, H, W, "border", True)[..., 0]
    gt = _to_inv_norm_clipped(gt, depth_range)
    out = {"loss_depth": weight * jnp.mean((gt - outputs["depth_mean"]) ** 2)}
    if "depth_mean_fine" in outputs:
        out["loss_depth_fine"] = weight * jnp.mean(
            (gt - outputs["depth_mean_fine"]) ** 2)
    return out


def sdf_loss(outputs, sdf_gt, sdf_weight: float = 1.0,
             eikonal_weight: float = 0.1):
    """SmoothL1 volume loss on valid voxels + eikonal (ref loss.py:149-178).

    sdf_gt [res,res,res] in [-1,1], invalid voxels == -1. The reference zeroes
    both sides by the mask and averages over ALL voxels (invalid ones contribute
    0 to the numerator but count in the mean) — reproduced exactly.
    """
    valid = (sdf_gt != -1.0).astype(outputs["volume"].dtype)
    vol = outputs["volume"]
    out = {
        "loss_sdf": sdf_weight * jnp.mean(smooth_l1(vol * valid,
                                                    sdf_gt * valid)),
        "loss_eikonal": eikonal_weight * jnp.mean(
            outputs["sdf_gradient_error"]),
        "variance": jnp.mean(outputs["s"]),
    }
    mae_mask = sdf_gt != -1.0
    out["sdf_mae"] = (jnp.sum(jnp.abs(vol * valid - sdf_gt * valid))
                      / jnp.maximum(jnp.sum(mae_mask), 1))
    return out


def vgn_loss(outputs, grasp_label, grasp_rot, grasp_width,
             weight: float = 1e-2):
    """Grasp head loss (ref loss.py:180-252): BCE quality + label-masked
    symmetric quaternion loss + 0.01 * label-masked width MSE.

    grasp_label [n], grasp_rot [n,2,4] (two gripper-symmetric GT quats, xyzw),
    grasp_width [n] (voxel units).
    """
    qual, rot, width = outputs["vgn_pred"]
    eps = 1e-7
    q = jnp.clip(qual, eps, 1 - eps)
    loss_qual = -(grasp_label * jnp.log(q)
                  + (1 - grasp_label) * jnp.log(1 - q))
    quat_err = 1.0 - jnp.abs(jnp.sum(rot[:, None, :] * grasp_rot, -1))
    loss_rot = grasp_label * jnp.min(quat_err, -1)
    loss_width = grasp_label * 0.01 * (width - grasp_width) ** 2
    total = loss_qual + loss_rot + loss_width

    num_pos = jnp.sum(grasp_label)
    rot_err = quat.rot_error_deg_symmetric(rot, grasp_rot)
    out = {
        "loss_vgn": weight * jnp.mean(total),
        "vgn_total_loss": jnp.mean(total),
        "vgn_qual_loss": jnp.mean(loss_qual),
        "vgn_rot_loss": jnp.mean(loss_rot),
        "vgn_width_loss": jnp.mean(loss_width),
        "vgn_qual_acc": 100.0 * jnp.mean(
            (jnp.round(qual) == grasp_label).astype(jnp.float32)),
        "vgn_rot_err": jnp.where(num_pos > 0,
                                 jnp.sum(grasp_label * rot_err)
                                 / jnp.maximum(num_pos, 1), 0.0),
    }
    return out


def total_loss(loss_dict: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Sum every 'loss*' entry (ref trainer.py:147-158)."""
    return sum(v for k, v in loss_dict.items() if k.startswith("loss"))


def psnr(pred, gt, mask=None):
    """PSNR on [0,1] colors (ref metrics.py:32-83)."""
    err = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(err, 1e-10))
