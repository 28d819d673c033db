"""Fused epipolar feature gather: ONE windowed gather per (point, view).

The reference fetches per-point features with three separate grid_sample calls
(rgb at full res, img_feats and ray_feats at quarter res — ref
src/nr/network/render_ops.py:54-70,132-144 + renderer.py:80-88). On TPU, XLA
lowers each 4-tap gather to a slow per-row fetch (~12 ms for the 40^3x6-view
volume workload, measured round 3); three of them dominate the whole forward.

This module replaces all three with a single `lax.gather` of (2,2,C) windows
from one packed quarter-resolution map:

  packed[..., 0:48]    = 4x4 space-to-depth blocks of the full-res RGB
  packed[..., 48:48+Ci] = img_feats
  packed[..., 48+Ci:]   = ray_feats

A (2,2) window of quarter-res cells anchored at (clip(y0q,0,fh-2),
clip(x0q,0,fw-2)) always contains

  * the 4 quarter-res bilinear taps of the feature maps
    (align_corners=False, border padding), and
  * the 4 full-res bilinear taps of the RGB image
    (align_corners=True, border padding),

because x_full = (x_q + 0.5) * (w-1)/fw with (w-1)/fw < 4 keeps the full-res
taps inside the window's 8x8 full-res footprint (proof in the design note
below). Tap selection within the window is pure VPU select/one-hot work that
fuses with the surrounding graph; the values are bit-identical to the
reference oracle path (tests/test_fused_gather.py asserts exact equality vs
ops.interpolate on every border case).

Why a (2,2,C) window gather: XLA TPU executes it ~2x faster than four
independent row gathers (6.9 ms vs 12.1 ms for the volume workload), and the
single fused map makes one gather do the work of three.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pack_feature_maps(imgs: jnp.ndarray, img_feats: jnp.ndarray,
                      ray_feats: jnp.ndarray,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Pack full-res RGB (4x4 space-to-depth) + both quarter-res feature maps.

    imgs [V,H,W,3] (H,W % 4 == 0), img_feats/ray_feats [V,H/4,W/4,C] →
    packed [V,H/4,W/4, 48+2C] in `dtype`. Space-to-depth channel layout:
    c = (dy*4 + dx)*3 + rgb for the (dy,dx) full-res pixel of the cell.

    dtype: the gather is fetch-bound but bf16 windows still measure ~8%
    faster than f32 (scripts/_bench_gather.py); interpolation weights stay
    f32 regardless (see _interp_from_win — bf16 windows promote to f32 at
    the weighted sum).
    """
    V, H, W, _ = imgs.shape
    fh, fw = img_feats.shape[1], img_feats.shape[2]
    if H != 4 * fh or W != 4 * fw:
        raise ValueError(f"imgs {H}x{W} not 4x the feature map {fh}x{fw}")
    s2d = imgs.reshape(V, fh, 4, fw, 4, 3).transpose(0, 1, 3, 2, 4, 5)
    s2d = s2d.reshape(V, fh, fw, 48).astype(dtype)
    return jnp.concatenate(
        [s2d, img_feats.astype(dtype), ray_feats.astype(dtype)], -1)


def _window_gather(packed: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray):
    """Gather (2,2,C) windows: packed [V,fh,fw,C], sy/sx [V,P] int32 →
    [V,P,2,2,C]. Anchors must already be clipped to [0, fh-2]/[0, fw-2]."""
    C = packed.shape[-1]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def one(fmap, starts):
        return jax.lax.gather(
            fmap, starts, dnums, slice_sizes=(2, 2, C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    starts = jnp.stack([sy, sx], -1)
    return jax.vmap(one)(packed, starts)


def _anchors(xy, h: int, w: int, fh: int, fw: int):
    """Clipped (2,2)-window anchor cells for full-res coords xy [V,P,2]."""
    xn = xy[..., 0] / (w - 1) * 2 - 1
    yn = xy[..., 1] / (h - 1) * 2 - 1
    xq = ((xn + 1.0) * fw - 1.0) * 0.5
    yq = ((yn + 1.0) * fh - 1.0) * 0.5
    sx = jnp.clip(jnp.floor(xq).astype(jnp.int32), 0, fw - 2)
    sy = jnp.clip(jnp.floor(yq).astype(jnp.int32), 0, fh - 2)
    return sy, sx


def _interp_from_win(win: jnp.ndarray, xy: jnp.ndarray, valid: jnp.ndarray,
                     h: int, w: int, fh: int, fw: int):
    """Bilinear interpolation given the gathered (2,2,Ctot) windows.

    Split out of the gather so the backward can differentiate it w.r.t.
    (win, xy, valid) with a plain jax.vjp — the a.e. grid-sample gradient —
    while the window SPLAT uses the matmul path (see _splat_windows).
    """
    Ctot = win.shape[-1]
    Cf = (Ctot - 48) // 2
    x = xy[..., 0]
    y = xy[..., 1]

    # exact same arithmetic sequence as ops/interpolate.py (bit-parity):
    # normalize by the full-res extent, then denormalize onto each map
    xn = x / (w - 1) * 2 - 1
    yn = y / (h - 1) * 2 - 1
    # quarter-res taps (align_corners=False)
    xq = ((xn + 1.0) * fw - 1.0) * 0.5
    yq = ((yn + 1.0) * fh - 1.0) * 0.5
    x0q = jnp.floor(xq)
    y0q = jnp.floor(yq)
    wxq = (xq - x0q)[..., None]
    wyq = (yq - y0q)[..., None]
    x0qi = x0q.astype(jnp.int32)
    y0qi = y0q.astype(jnp.int32)
    sx = jnp.clip(x0qi, 0, fw - 2)
    sy = jnp.clip(y0qi, 0, fh - 2)

    # ---- feature maps: fold the border-clamped taps into per-cell weights -
    # The 4 bilinear taps live at window offsets (oy∈{0,1}, ox∈{0,1}); the
    # per-cell weight factorizes into row x col terms (each tap's y-offset
    # depends only on its row index and weight wy_i, ditto x), so the whole
    # bilinear+border-clamp reduces to 4 scalar-weighted MACs on the window —
    # no selects, no per-tap tensors.
    featw = win[..., 48:]
    oy0 = jnp.clip(y0qi, 0, fh - 1) - sy       # ∈ {0,1}
    oy1 = jnp.clip(y0qi + 1, 0, fh - 1) - sy
    ox0 = jnp.clip(x0qi, 0, fw - 1) - sx
    ox1 = jnp.clip(x0qi + 1, 0, fw - 1) - sx
    wy1 = wyq[..., 0]
    wx1 = wxq[..., 0]
    rw0 = jnp.where(oy0 == 0, 1 - wy1, 0.0) + jnp.where(oy1 == 0, wy1, 0.0)
    rw1 = jnp.where(oy0 == 1, 1 - wy1, 0.0) + jnp.where(oy1 == 1, wy1, 0.0)
    cw0 = jnp.where(ox0 == 0, 1 - wx1, 0.0) + jnp.where(ox1 == 0, wx1, 0.0)
    cw1 = jnp.where(ox0 == 1, 1 - wx1, 0.0) + jnp.where(ox1 == 1, wx1, 0.0)
    feat = (featw[:, :, 0, 0] * (rw0 * cw0)[..., None]
            + featw[:, :, 0, 1] * (rw0 * cw1)[..., None]
            + featw[:, :, 1, 0] * (rw1 * cw0)[..., None]
            + featw[:, :, 1, 1] * (rw1 * cw1)[..., None])
    img_f, ray_f = feat[..., :Cf], feat[..., Cf:]

    # ---- RGB: full-res taps (align_corners=True, oracle's exact arith) ----
    H, W = 4 * fh, 4 * fw
    xf = (xn + 1.0) * 0.5 * (W - 1)
    yf = (yn + 1.0) * 0.5 * (H - 1)
    x0f = jnp.floor(xf)
    y0f = jnp.floor(yf)
    wxf = (xf - x0f)[..., None]
    wyf = (yf - y0f)[..., None]
    x0fi = x0f.astype(jnp.int32)
    y0fi = y0f.astype(jnp.int32)

    # Same weight-folding trick at full resolution: the 2 y-taps land at
    # window-relative rows uy∈[0,8) (2 window cells x 4 subpixels) with
    # weights (1-wyf, wyf); build the 8-slot row/col weight vectors and
    # contract — two small einsums instead of 4x16 masked selects.
    rgbw = win[..., :48].reshape(win.shape[:4] + (4, 4, 3))  # [V,P,a,b,i,j,3]
    uy0 = jnp.clip(jnp.clip(y0fi, 0, H - 1) - 4 * sy, 0, 7)      # ∈ [0, 8)
    uy1 = jnp.clip(jnp.clip(y0fi + 1, 0, H - 1) - 4 * sy, 0, 7)
    ux0 = jnp.clip(jnp.clip(x0fi, 0, W - 1) - 4 * sx, 0, 7)
    ux1 = jnp.clip(jnp.clip(x0fi + 1, 0, W - 1) - 4 * sx, 0, 7)
    wyf1 = wyf[..., 0]
    wxf1 = wxf[..., 0]
    slots = jnp.arange(8, dtype=jnp.int32)
    rw = (jnp.where(uy0[..., None] == slots, (1 - wyf1)[..., None], 0.0)
          + jnp.where(uy1[..., None] == slots, wyf1[..., None], 0.0))
    cw = (jnp.where(ux0[..., None] == slots, (1 - wxf1)[..., None], 0.0)
          + jnp.where(ux1[..., None] == slots, wxf1[..., None], 0.0))
    rw4 = rw.reshape(rw.shape[:-1] + (2, 4))   # [V,P,a,i]
    cw4 = cw.reshape(cw.shape[:-1] + (2, 4))   # [V,P,b,j]
    t1 = jnp.einsum("vpabijc,vpbj->vpaic", rgbw, cw4)
    rgb = jnp.einsum("vpaic,vpai->vpc", t1, rw4)

    m = valid[..., None].astype(feat.dtype)
    return rgb * m, img_f * m, ray_f * m


def _splat_windows(d_win: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                   fh: int, fw: int, chunk: int = 4096) -> jnp.ndarray:
    """Transpose of _window_gather: accumulate (2,2,C) window grads into the
    map — WITHOUT lax.scatter-add, which XLA:TPU executes as a serial
    per-update loop (measured 1.6 s for the 40^3 workload's 384k windows,
    ~4.2 us/update — it was the entire training-step cost). Instead each
    point-chunk contributes through a one-hot cell matrix contracted on the
    MXU; f32 accumulation, bf16 operands (one-hot entries are exact).

    d_win [V,P,2,2,C], anchors sy/sx [V,P] → [V,fh,fw,C] float32.
    """
    V, P, _, _, C = d_win.shape
    N = fh * fw
    pad = (-P) % chunk
    if pad:
        d_win = jnp.pad(d_win, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        # padded points: anchor 0 with zero grads — contribute nothing
        sy = jnp.pad(sy, ((0, 0), (0, pad)))
        sx = jnp.pad(sx, ((0, 0), (0, pad)))
    nc = (P + pad) // chunk
    # fold the 2x2 taps into the point axis: tap (oy,ox) of point p targets
    # cell (sy+oy)*fw + (sx+ox)
    cell = sy * fw + sx                                   # [V,P']
    offs = jnp.asarray([0, 1, fw, fw + 1], jnp.int32)     # (oy,ox) raveled
    cells4 = cell[:, :, None] + offs[None, None]          # [V,P',4]
    dw4 = d_win.reshape(V, P + pad, 4, C)
    cells4 = cells4.reshape(V, nc, chunk * 4)
    dw4 = dw4.reshape(V, nc, chunk * 4, C)

    ids = jnp.arange(N, dtype=jnp.int32)

    def body(acc, args):
        cid, dwc = args                                   # [V,c4], [V,c4,C]
        # f32 operands: a one-hot contraction in f32 is EXACT (it only
        # reorders the sum of f32 grads), so the custom backward matches the
        # scatter-add gradient to reassociation rounding
        onehot = (cid[..., None] == ids).astype(jnp.float32)
        acc = acc + jnp.einsum(
            "vpn,vpc->vnc", onehot, dwc.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((V, N, C), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0,
                          (cells4.transpose(1, 0, 2),
                           dw4.transpose(1, 0, 2, 3)))
    return acc.reshape(V, fh, fw, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_epipolar_gather(packed: jnp.ndarray, xy: jnp.ndarray,
                          valid: jnp.ndarray, h: int, w: int):
    """Sample rgb + img_feats + ray_feats at xy with one windowed gather.

    packed [V,fh,fw,48+2C] from pack_feature_maps; xy [V,P,2] continuous
    full-resolution pixel coords; valid [V,P] bool/float mask; (h, w) the
    full-res extent the coords live in (== 4*fh, 4*fw here).

    Returns (rgb [V,P,3], img_f [V,P,C], ray_f [V,P,C]) — identical values to
    interpolate_feature_map(imgs/img_feats/ray_feats, xy, valid, h, w).

    custom_vjp: the backward re-gathers the windows, takes the grid-sample
    a.e. gradient of the interpolation via jax.vjp, and splats window grads
    with _splat_windows (MXU one-hot matmuls) instead of XLA's serialized
    scatter-add (40x faster on the training step).
    """
    V, fh, fw, _ = packed.shape
    sy, sx = _anchors(xy, h, w, fh, fw)
    win = _window_gather(packed, sy, sx)
    return _interp_from_win(win, xy, valid, h, w, fh, fw)


def _feg_fwd(packed, xy, valid, h, w):
    out = fused_epipolar_gather(packed, xy, valid, h, w)
    return out, (packed, xy, valid)


def _feg_bwd(h, w, res, g):
    packed, xy, valid = res
    V, fh, fw, _ = packed.shape
    sy, sx = _anchors(xy, h, w, fh, fw)
    win = _window_gather(packed, sy, sx)
    _, vjp = jax.vjp(
        lambda wn, xyv, vv: _interp_from_win(wn, xyv, vv, h, w, fh, fw),
        win, xy, valid)
    d_win, d_xy, d_valid = vjp(g)
    d_packed = _splat_windows(d_win, sy, sx, fh, fw)
    return d_packed.astype(packed.dtype), d_xy, d_valid


fused_epipolar_gather.defvjp(_feg_fwd, _feg_bwd)
