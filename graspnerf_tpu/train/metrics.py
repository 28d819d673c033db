"""Validation metrics + image dumps (ref: src/nr/network/metrics.py).

psnr/ssim are pure-jnp (jit-safe); visualize_image writes side-by-side
pred/GT panels like the reference's VisualizeImage (metrics.py:86-114).
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


def psnr(pred, gt, max_val: float = 1.0):
    mse = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def ssim(pred, gt, max_val: float = 1.0, filter_size: int = 11,
         sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03):
    """Gaussian-windowed SSIM on [H,W,C] images (scikit-image semantics)."""
    r = filter_size // 2
    x = np.arange(-r, r + 1, dtype=np.float32)
    w = np.exp(-0.5 * (x / sigma) ** 2)
    w = jnp.asarray(w / w.sum())

    def blur(img):
        img = jnp.moveaxis(img, -1, 0)  # C,H,W
        img = jnp.pad(img, ((0, 0), (r, r), (r, r)), mode="symmetric")
        img = jax.vmap(lambda ch: jax.vmap(
            lambda row: jnp.convolve(row, w, "valid"))(ch))(img)
        img = jnp.swapaxes(img, 1, 2)
        img = jax.vmap(lambda ch: jax.vmap(
            lambda row: jnp.convolve(row, w, "valid"))(ch))(img)
        return jnp.moveaxis(jnp.swapaxes(img, 1, 2), 0, -1)

    mu_p, mu_g = blur(pred), blur(gt)
    var_p = blur(pred * pred) - mu_p ** 2
    var_g = blur(gt * gt) - mu_g ** 2
    cov = blur(pred * gt) - mu_p * mu_g
    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    s = ((2 * mu_p * mu_g + c1) * (2 * cov + c2)) / (
        (mu_p ** 2 + mu_g ** 2 + c1) * (var_p + var_g + c2))
    return jnp.mean(s)


def depth_mae(pred, gt, mask=None):
    err = jnp.abs(pred - gt)
    if mask is not None:
        m = mask.astype(err.dtype)
        return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1)
    return jnp.mean(err)


def visualize_image(pred_rgb, gt_rgb, out_dir: str, step: int,
                    name: str = "val"):
    """Write a side-by-side pred|gt panel (ref VisualizeImage writes to
    data/vis_val)."""
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    p = np.clip(np.asarray(pred_rgb), 0, 1)
    g = np.clip(np.asarray(gt_rgb), 0, 1)
    panel = (np.concatenate([p, g], axis=1) * 255).astype(np.uint8)
    path = os.path.join(out_dir, f"{step}-{name}.png")
    Image.fromarray(panel).save(path)
    return path
