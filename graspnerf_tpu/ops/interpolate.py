"""Bilinear feature-map sampling at continuous pixel coords (grid_sample equivalent).

This is the single most performance-critical primitive in the pipeline: every
(sample point x source view) pair fetches an interpolated feature vector
(ref: src/nr/network/ops.py:14-34 and render_ops.py:54-70). The jnp version
below is the correctness oracle; the hot path uses ops/fused_gather.py (one
windowed lax.gather over a packed rgb+feature map — same values, ~5x faster
on TPU).

Layout: feature maps are channels-last [.., H, W, C] (TPU-native); coords are
(x, y) in *full-resolution* pixel units even when sampling a downsampled map —
the normalization uses the full-res (w-1, h-1) extent and the de-normalization
uses the map's own size, reproducing the reference's semantics exactly.
"""
from __future__ import annotations

import jax.numpy as jnp


def _denorm(coord_norm, size, align_corners):
    """[-1,1] normalized coord -> pixel coord on a map of `size` pixels."""
    if align_corners:
        return (coord_norm + 1.0) * 0.5 * (size - 1)
    return ((coord_norm + 1.0) * size - 1.0) * 0.5


def grid_sample_2d(feats, px, py, padding_mode="zeros"):
    """Sample feats [H,W,C] at continuous pixel coords px/py [...] -> [...,C].

    Convention: integer coords hit pixel centers. Out-of-range taps are clamped
    (padding_mode='border') or zeroed (padding_mode='zeros'), matching
    torch.nn.functional.grid_sample.
    """
    H, W, C = feats.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        v = feats[yc, xc]  # ...,C
        if padding_mode == "zeros":
            ok = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            v = v * ok[..., None].astype(v.dtype)
        return v

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def interpolate_feats(feats, points, h=None, w=None, padding_mode="zeros",
                      align_corners=False):
    """Batched sampling: feats [B,fh,fw,C], points [B,N,2] (x,y in h x w units).

    When h/w are None they default to the map's own size. Mirrors the reference
    interpolate_feats (src/nr/network/ops.py:14-34): points are normalized by
    the (h-1, w-1) extent and resampled on the (fh, fw) map under the chosen
    align_corners convention.
    """
    B, fh, fw, C = feats.shape
    if h is None and w is None:
        h, w = fh, fw
    x_norm = points[..., 0] / (w - 1) * 2 - 1
    y_norm = points[..., 1] / (h - 1) * 2 - 1
    px = _denorm(x_norm, fw, align_corners)
    py = _denorm(y_norm, fh, align_corners)
    import jax
    return jax.vmap(lambda f, x, y: grid_sample_2d(f, x, y, padding_mode))(feats, px, py)


def interpolate_feature_map(feats, points, mask, h, w):
    """Feature fetch with validity masking (ref: render_ops.py:54-70).

    feats [B,fh,fw,C], points [B,N,2], mask [B,N] -> [B,N,C].
    Uses border padding; align_corners=True only when the map is full-res.
    """
    B, fh, fw, C = feats.shape
    align = (fh == h and fw == w)
    out = interpolate_feats(feats, points, h, w, "border", align)
    return out * mask[..., None].astype(out.dtype)


def resize_bilinear_align_corners(x, out_h: int, out_w: int):
    """Bilinear resize with align_corners=True (torch F.interpolate semantics).

    x [..., H, W, C]. Implemented as two small dense interpolation matrices
    applied with einsum — exact, differentiable, and MXU-friendly.
    """
    H, W = x.shape[-3], x.shape[-2]

    def interp_matrix(n_in, n_out):
        if n_out == 1 or n_in == 1:
            return jnp.ones((n_out, n_in), jnp.float32) / n_in
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        t = pos - i0.astype(jnp.float32)
        m = jnp.zeros((n_out, n_in), jnp.float32)
        rows = jnp.arange(n_out)
        m = m.at[rows, i0].add(1 - t)
        m = m.at[rows, i0 + 1].add(t)
        return m

    My = interp_matrix(H, out_h)  # out_h,H
    Mx = interp_matrix(W, out_w)  # out_w,W
    x = jnp.einsum("oh,...hwc->...owc", My, x)
    x = jnp.einsum("ow,...hwc->...hoc", Mx, x)
    return x


def resize_nearest(x, out_h: int, out_w: int):
    """Nearest-neighbor resize matching torch F.interpolate(mode='nearest'):
    source index = floor(i * in/out). x [..., H, W, C]."""
    H, W = x.shape[-3], x.shape[-2]
    iy = jnp.floor(jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
    return x[..., iy[:, None], ix[None, :], :]


def resize_nearest_3d(x, out_d: int, out_h: int, out_w: int):
    """Nearest-neighbor volumetric resize (torch F.interpolate on 5D 'nearest').

    x [..., D, H, W, C]."""
    D, H, W = x.shape[-4], x.shape[-3], x.shape[-2]
    iz = jnp.floor(jnp.arange(out_d) * (D / out_d)).astype(jnp.int32)
    iy = jnp.floor(jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
    return x[..., iz[:, None, None], iy[None, :, None], ix[None, None, :], :]
