"""Dev micro-bench: epipolar-gather strategies on the live chip.

The round-5 stage profile puts the fused windowed gather at 9.2 ms of the
24 ms volume forward (and ~5x that at render scale). This times the
candidate replacements so the winner (not a guess) ships:

  fused112       current: one (2,2,112) window gather from the packed map
  fused112_bf16  same, packed map cast to bf16 (halves window traffic)
  split          (2,2,64) feats window gather + (2,2,3) full-res RGB window
                 gather (kills the 48-ch space-to-depth RGB inflation)
  split_bf16     same with bf16 maps
  rowgather      the original three interpolate_feature_map row gathers
  takeflat       4 flat-index row gathers (taps) from [V, fh*fw, C]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import numpy as np

from graspnerf_tpu.ops.fused_gather import (pack_feature_maps,
                                            fused_epipolar_gather,
                                            _window_gather)
from graspnerf_tpu.ops.interpolate import interpolate_feature_map
from bench import slope_time

V, H, W, CF = 6, 288, 512, 32
FH, FW = H // 4, W // 4


def make_inputs(P, seed=0):
    rng = np.random.RandomState(seed)
    imgs = jnp.asarray(rng.rand(V, H, W, 3).astype(np.float32))
    imf = jnp.asarray(rng.rand(V, FH, FW, CF).astype(np.float32))
    rayf = jnp.asarray(rng.rand(V, FH, FW, CF).astype(np.float32))
    xy = jnp.asarray(
        (rng.rand(V, P, 2) * np.array([W + 40, H + 40]) - 20).astype(
            np.float32))
    valid = jnp.asarray((rng.rand(V, P) > 0.1).astype(np.float32))
    return imgs, imf, rayf, xy, valid


def reduce_out(rgb, a, b):
    return jnp.mean(rgb) + jnp.mean(a) + jnp.mean(b)


def full_res_window_rgb(imgs, xy, valid, h, w, dtype=jnp.float32):
    """RGB via its own (2,2,3) full-res window gather (align_corners=True,
    border padding), weight-folded like the feats path."""
    x = xy[..., 0]
    y = xy[..., 1]
    xn = x / (w - 1) * 2 - 1
    yn = y / (h - 1) * 2 - 1
    xf = (xn + 1.0) * 0.5 * (w - 1)
    yf = (yn + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    wx = (xf - x0)
    wy = (yf - y0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    sx = jnp.clip(x0i, 0, w - 2)
    sy = jnp.clip(y0i, 0, h - 2)
    win = _window_gather(imgs.astype(dtype), sy, sx)  # [V,P,2,2,3]
    oy0 = jnp.clip(y0i, 0, h - 1) - sy
    oy1 = jnp.clip(y0i + 1, 0, h - 1) - sy
    ox0 = jnp.clip(x0i, 0, w - 1) - sx
    ox1 = jnp.clip(x0i + 1, 0, w - 1) - sx
    rw0 = jnp.where(oy0 == 0, 1 - wy, 0.0) + jnp.where(oy1 == 0, wy, 0.0)
    rw1 = jnp.where(oy0 == 1, 1 - wy, 0.0) + jnp.where(oy1 == 1, wy, 0.0)
    cw0 = jnp.where(ox0 == 0, 1 - wx, 0.0) + jnp.where(ox1 == 0, wx, 0.0)
    cw1 = jnp.where(ox0 == 1, 1 - wx, 0.0) + jnp.where(ox1 == 1, wx, 0.0)
    winf = win.astype(jnp.float32)
    rgb = (winf[:, :, 0, 0] * (rw0 * cw0)[..., None]
           + winf[:, :, 0, 1] * (rw0 * cw1)[..., None]
           + winf[:, :, 1, 0] * (rw1 * cw0)[..., None]
           + winf[:, :, 1, 1] * (rw1 * cw1)[..., None])
    return rgb * valid[..., None]


def quarter_window_feats(packed_qf, xy, valid, h, w, dtype=jnp.float32):
    """img+ray feats via a (2,2,2*CF) quarter-res window gather
    (align_corners=False), identical arithmetic to fused_epipolar_gather."""
    fh, fw = packed_qf.shape[1], packed_qf.shape[2]
    x = xy[..., 0]
    y = xy[..., 1]
    xn = x / (w - 1) * 2 - 1
    yn = y / (h - 1) * 2 - 1
    xq = ((xn + 1.0) * fw - 1.0) * 0.5
    yq = ((yn + 1.0) * fh - 1.0) * 0.5
    x0q = jnp.floor(xq)
    y0q = jnp.floor(yq)
    wxq = xq - x0q
    wyq = yq - y0q
    x0qi = x0q.astype(jnp.int32)
    y0qi = y0q.astype(jnp.int32)
    sx = jnp.clip(x0qi, 0, fw - 2)
    sy = jnp.clip(y0qi, 0, fh - 2)
    win = _window_gather(packed_qf.astype(dtype), sy, sx)
    oy0 = jnp.clip(y0qi, 0, fh - 1) - sy
    oy1 = jnp.clip(y0qi + 1, 0, fh - 1) - sy
    ox0 = jnp.clip(x0qi, 0, fw - 1) - sx
    ox1 = jnp.clip(x0qi + 1, 0, fw - 1) - sx
    rw0 = jnp.where(oy0 == 0, 1 - wyq, 0.0) + jnp.where(oy1 == 0, wyq, 0.0)
    rw1 = jnp.where(oy0 == 1, 1 - wyq, 0.0) + jnp.where(oy1 == 1, wyq, 0.0)
    cw0 = jnp.where(ox0 == 0, 1 - wxq, 0.0) + jnp.where(ox1 == 0, wxq, 0.0)
    cw1 = jnp.where(ox0 == 1, 1 - wxq, 0.0) + jnp.where(ox1 == 1, wxq, 0.0)
    winf = win.astype(jnp.float32)
    feat = (winf[:, :, 0, 0] * (rw0 * cw0)[..., None]
            + winf[:, :, 0, 1] * (rw0 * cw1)[..., None]
            + winf[:, :, 1, 0] * (rw1 * cw0)[..., None]
            + winf[:, :, 1, 1] * (rw1 * cw1)[..., None])
    return feat * valid[..., None]


def takeflat(fmap, xy, valid, h, w):
    """4 flat-index tap gathers (no windows)."""
    fh, fw, C = fmap.shape[1:]
    flat = fmap.reshape(V, fh * fw, C)
    x = xy[..., 0]
    y = xy[..., 1]
    xn = x / (w - 1) * 2 - 1
    yn = y / (h - 1) * 2 - 1
    xq = ((xn + 1.0) * fw - 1.0) * 0.5
    yq = ((yn + 1.0) * fh - 1.0) * 0.5
    x0 = jnp.floor(xq)
    y0 = jnp.floor(yq)
    wx = (xq - x0)[..., None]
    wy = (yq - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, fw - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, fw - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, fh - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, fh - 1)

    def tap(yi, xi):
        idx = yi * fw + xi
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    v = (tap(y0i, x0i) * (1 - wy) * (1 - wx)
         + tap(y0i, x1i) * (1 - wy) * wx
         + tap(y1i, x0i) * wy * (1 - wx)
         + tap(y1i, x1i) * wy * wx)
    return v * valid[..., None]


def main():
    for P in (64000, 4096 * 80):
        imgs, imf, rayf, xy, valid = make_inputs(P)
        packed = jax.jit(pack_feature_maps)(imgs, imf, rayf)
        packed_bf = packed.astype(jnp.bfloat16)
        packed_qf = jnp.concatenate([imf, rayf], -1)  # [V,FH,FW,64]
        packed_qf_bf = packed_qf.astype(jnp.bfloat16)
        imgs_bf = imgs.astype(jnp.bfloat16)
        print(f"== P = {P}", flush=True)

        def t(name, fn, *args):
            c = jax.jit(fn).lower(*args, jnp.float32(0.0)).compile()
            dt = slope_time(c, *args)
            print(f"{name:16s} {dt*1e3:8.2f} ms", flush=True)

        def f_fused(packed, xy, valid, fb):
            rgb, a, b = fused_epipolar_gather(
                packed, xy + 1e-6 * fb, valid, H, W)
            return reduce_out(rgb, a, b)
        t("fused112", f_fused, packed, xy, valid)
        t("fused112_bf16", f_fused, packed_bf, xy, valid)

        def f_split(qf, im, xy, valid, fb):
            xyp = xy + 1e-6 * fb
            feat = quarter_window_feats(qf, xyp, valid, H, W, qf.dtype)
            rgb = full_res_window_rgb(im, xyp, valid, H, W, im.dtype)
            return reduce_out(rgb, feat[..., :CF], feat[..., CF:])
        t("split", f_split, packed_qf, imgs, xy, valid)
        t("split_bf16", f_split, packed_qf_bf, imgs_bf, xy, valid)

        def f_row(imgs, imf, rayf, xy, valid, fb):
            xyp = xy + 1e-6 * fb
            a = interpolate_feature_map(rayf, xyp, valid, H, W)
            rgb = interpolate_feature_map(imgs, xyp, valid, H, W)
            b = interpolate_feature_map(imf, xyp, valid, H, W)
            return reduce_out(rgb, a, b)
        t("rowgather", f_row, imgs, imf, rayf, xy, valid)

        def f_take(qf, im, xy, valid, fb):
            xyp = xy + 1e-6 * fb
            feat = takeflat(qf, xyp, valid, H, W)
            rgb = full_res_window_rgb(im, xyp, valid, H, W, im.dtype)
            return reduce_out(rgb, feat[..., :CF], feat[..., CF:])
        t("takeflat", f_take, packed_qf, imgs, xy, valid)


if __name__ == "__main__":
    main()


def precombined(packed, xy, valid, h, w):
    """ONE flat row gather from a 4-tap-precombined map: Pc[cell] holds the
    (y,x),(y,x+1),(y+1,x),(y+1,x+1) cells concatenated (edge-clamped), so a
    point needs a single dynamic row fetch instead of a (2,2) window."""
    V, fh, fw, C = packed.shape
    p_x = jnp.concatenate([packed[:, :, 1:], packed[:, :, -1:]], 2)
    p_y = jnp.concatenate([packed[:, 1:], packed[:, -1:]], 1)
    p_xy = jnp.concatenate([p_y[:, :, 1:], p_y[:, :, -1:]], 2)
    pc = jnp.concatenate([packed, p_x, p_y, p_xy], -1).reshape(
        V, fh * fw, 4 * C)

    x = xy[..., 0]
    y = xy[..., 1]
    xn = x / (w - 1) * 2 - 1
    yn = y / (h - 1) * 2 - 1
    xq = ((xn + 1.0) * fw - 1.0) * 0.5
    yq = ((yn + 1.0) * fh - 1.0) * 0.5
    x0q = jnp.floor(xq)
    y0q = jnp.floor(yq)
    wxq = xq - x0q
    wyq = yq - y0q
    x0i = jnp.clip(x0q.astype(jnp.int32), 0, fw - 1)
    y0i = jnp.clip(y0q.astype(jnp.int32), 0, fh - 1)
    idx = y0i * fw + x0i
    rows = jnp.take_along_axis(pc, idx[..., None], axis=1)  # [V,P,4C]
    win = rows.reshape(V, -1, 2, 2, C).astype(jnp.float32)
    w00 = ((1 - wyq) * (1 - wxq))[..., None]
    w01 = ((1 - wyq) * wxq)[..., None]
    w10 = (wyq * (1 - wxq))[..., None]
    w11 = (wyq * wxq)[..., None]
    feat = (win[:, :, 0, 0] * w00 + win[:, :, 0, 1] * w01
            + win[:, :, 1, 0] * w10 + win[:, :, 1, 1] * w11)
    return feat * valid[..., None]


def main2():
    for P in (64000, 4096 * 80):
        imgs, imf, rayf, xy, valid = make_inputs(P)
        packed = jax.jit(pack_feature_maps)(imgs, imf, rayf)
        packed_bf = packed.astype(jnp.bfloat16)
        print(f"== P = {P}", flush=True)

        def t(name, fn, *args):
            c = jax.jit(fn).lower(*args, jnp.float32(0.0)).compile()
            dt = slope_time(c, *args)
            print(f"{name:16s} {dt*1e3:8.2f} ms", flush=True)

        def f_pre(packed, xy, valid, fb):
            out = precombined(packed, xy + 1e-6 * fb, valid, H, W)
            return jnp.mean(out).astype(jnp.float32)
        t("precomb", f_pre, packed, xy, valid)
        t("precomb_bf16", f_pre, packed_bf, xy, valid)

        def f_fused(packed, xy, valid, fb):
            rgb, a, b = fused_epipolar_gather(
                packed, xy + 1e-6 * fb, valid, H, W)
            return reduce_out(rgb, a, b).astype(jnp.float32)
        t("fused112", f_fused, packed, xy, valid)
