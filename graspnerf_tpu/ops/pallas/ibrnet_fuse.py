"""Pallas TPU kernel: IBRNet-NeuS per-view MLP stack + cross-view fusion.

Covers the reference hot loop src/nr/network/ibrnet.py:447-491 (everything
between the gathered per-view features and the geometry/color heads):

    ray-dir MLP → rgb_feat residual → neuray weights → weighted mean/var
    → base MLP → vis MLPs → visibility-weighted re-fusion → feat_const

In XLA this is ~15 small Dense layers whose [V,N,C] activations each round-trip
through HBM (plus layout transposes). The kernel keeps every intermediate in
VMEM for a tile of N rows, runs all matmuls back-to-back on the MXU, and only
writes the four results the downstream heads need.

Forward = Pallas; backward = jax.vjp of the jnp reference below (recompute —
the activations are cheap relative to storing them), wired via jax.custom_vjp.
`view_fuse_reference` is also the CPU/test oracle: tests/test_pallas_fuse.py
checks the kernel (interpret mode off-TPU) against it elementwise.

Weight layout matches the flax modules in models/ibrnet.py so the PyTorch
checkpoint converter keeps working; see `collect_params` there.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# channel sizes fixed by the architecture (ref ibrnet.py:373-435)
C_RGBF = 35     # rgb(3) + image features(32)
C_NEUR = 32     # neuray / prob embedding
C_DIFF = 4      # direction difference + dot
C_X = 32        # fused feature width
C_OUT = 65      # mean(32) + var(32) + mean-weight(1)

# weight pytree order (each entry (kernel, bias)): see collect_params
W_NAMES = ("ray_dir_fc.0", "ray_dir_fc.2", "neuray_fc.0", "neuray_fc.2",
           "base_fc.0", "base_fc.2", "vis_fc.0", "vis_fc.2",
           "vis_fc2.0", "vis_fc2.2")


def _mm(x, w, b, dtype):
    y = jax.lax.dot_general(
        x.astype(dtype), w.astype(dtype), (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(dtype)


def view_fuse_reference(rgbf, neur, rdiff, mask, weights, dtype=jnp.float32):
    """jnp oracle. Inputs [V,N,C] (views leading); weights = tuple of
    (kernel, bias) pairs in W_NAMES order. Returns
    (feat_const [N,65], num_valid [N,1], x [V,N,32], vis [V,N,1])."""
    (wd0, wd1, wn0, wn1, wb0, wb1, wv0, wv1, wv20, wv21) = weights
    rgbf = rgbf.astype(dtype)
    neur = neur.astype(dtype)
    rdiff = rdiff.astype(dtype)
    mask = mask.astype(dtype)

    df = jax.nn.elu(_mm(rdiff, *wd0, dtype=dtype))
    df = jax.nn.elu(_mm(df, *wd1, dtype=dtype))
    rf = rgbf + df

    weight = mask / (jnp.sum(mask, 0, keepdims=True) + 1e-8)
    w0 = jax.nn.elu(_mm(neur, *wn0, dtype=dtype))
    w0 = jax.nn.sigmoid(_mm(w0, *wn1, dtype=dtype)) * weight

    def wmv(x, w):
        mean = jnp.sum(x * w, 0)
        var = jnp.sum(w * (x - mean[None]) ** 2, 0)
        return mean, var

    mean0, var0 = wmv(rf, w0)
    mean1, var1 = wmv(rf, weight)
    gf = jnp.concatenate([mean0, var0, mean1, var1], -1)  # [N,140]

    V = rgbf.shape[0]
    xin = jnp.concatenate(
        [jnp.broadcast_to(gf[None], (V,) + gf.shape), rf, neur], -1)
    x = jax.nn.elu(_mm(xin, *wb0, dtype=dtype))
    x = jax.nn.elu(_mm(x, *wb1, dtype=dtype))

    xv = jax.nn.elu(_mm(x * weight, *wv0, dtype=dtype))
    xv = jax.nn.elu(_mm(xv, *wv1, dtype=dtype))
    x_res, vis = xv[..., :C_X], xv[..., C_X:]
    vis = jax.nn.sigmoid(vis) * mask
    x = x + x_res
    v2 = jax.nn.elu(_mm(x * vis, *wv20, dtype=dtype))
    vis = jax.nn.sigmoid(_mm(v2, *wv21, dtype=dtype)) * mask

    weight2 = vis / (jnp.sum(vis, 0, keepdims=True) + 1e-8)
    mean, var = wmv(x, weight2)
    feat_const = jnp.concatenate([mean, var, jnp.mean(weight2, 0)], -1)
    num_valid = jnp.sum(mask, 0)
    return (feat_const.astype(dtype), num_valid.astype(jnp.float32),
            x.astype(dtype), vis.astype(dtype))


def _elu(x):
    """ELU without expm1 (unimplemented in Mosaic); exp(x)-1 loses at most
    ~1e-8 absolute near 0, far inside the kernel's parity tolerance."""
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _sigmoid(x):
    """Sigmoid in f32: Mosaic's bf16 `logistic` lowering emits an invalid
    f32->bf16 vector.broadcast (verified on the v5e backend), so upcast,
    apply, and cast back."""
    return jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def _kernel(rgbf_ref, neur_ref, rdiff_ref, mask_ref,
            wd0k, wd0b, wd1k, wd1b, wn0k, wn0b, wn1k, wn1b,
            wb0k, wb0b, wb1k, wb1b, wv0k, wv0b, wv1k, wv1b,
            wv20k, wv20b, wv21k, wv21b,
            fc_ref, nv_ref, x_ref, vis_ref, *, V: int, dtype):
    def mm(x, kref, bref):
        y = jax.lax.dot_general(
            x.astype(dtype), kref[:].astype(dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return (y + bref[:].astype(jnp.float32)).astype(dtype)

    masks = [mask_ref[v].astype(dtype) for v in range(V)]
    msum = sum(masks) + 1e-8
    nv_ref[:] = sum(m.astype(jnp.float32) for m in masks)

    rfs, w0s, weights_, neurs = [], [], [], []
    for v in range(V):
        rdiff = rdiff_ref[v].astype(dtype)
        df = _elu(mm(rdiff, wd0k, wd0b))
        df = _elu(mm(df, wd1k, wd1b))
        rf = rgbf_ref[v].astype(dtype) + df
        neur = neur_ref[v].astype(dtype)
        weight = masks[v] / msum
        w0 = _elu(mm(neur, wn0k, wn0b))
        w0 = jax.nn.sigmoid(mm(w0, wn1k, wn1b)) * weight
        rfs.append(rf)
        w0s.append(w0)
        weights_.append(weight)
        neurs.append(neur)

    mean0 = sum(rf * w0 for rf, w0 in zip(rfs, w0s))
    var0 = sum(w0 * (rf - mean0) ** 2 for rf, w0 in zip(rfs, w0s))
    mean1 = sum(rf * w for rf, w in zip(rfs, weights_))
    var1 = sum(w * (rf - mean1) ** 2 for rf, w in zip(rfs, weights_))
    gf = jnp.concatenate([mean0, var0, mean1, var1], -1)  # [T,140]

    xs, viss = [], []
    for v in range(V):
        xin = jnp.concatenate([gf, rfs[v], neurs[v]], -1)  # [T,207]
        x = _elu(mm(xin, wb0k, wb0b))
        x = _elu(mm(x, wb1k, wb1b))
        xv = _elu(mm(x * weights_[v], wv0k, wv0b))
        xv = _elu(mm(xv, wv1k, wv1b))
        x_res, vis = xv[..., :C_X], xv[..., C_X:]
        vis = jax.nn.sigmoid(vis) * masks[v]
        x = x + x_res
        v2 = _elu(mm(x * vis, wv20k, wv20b))
        vis = jax.nn.sigmoid(mm(v2, wv21k, wv21b)) * masks[v]
        xs.append(x)
        viss.append(vis)
        x_ref[v] = x
        vis_ref[v] = vis

    vsum = sum(viss) + 1e-8
    w2s = [v / vsum for v in viss]
    mean = sum(x * w for x, w in zip(xs, w2s))
    var = sum(w * (x - mean) ** 2 for x, w in zip(xs, w2s))
    wmean = sum(w2s) / V
    fc_ref[:] = jnp.concatenate([mean, var, wmean], -1).astype(fc_ref.dtype)


def _view_fuse_pallas(rgbf, neur, rdiff, mask, weights, dtype,
                      tile: int = 2048):
    V, N, _ = rgbf.shape
    pad = (-N) % tile
    if pad:
        z = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
        rgbf, neur, rdiff, mask = z(rgbf), z(neur), z(rdiff), z(mask)
    Np = N + pad
    nt = Np // tile

    flat_w = []
    for k, b in weights:
        flat_w += [k, b.reshape(1, -1)]  # 2D biases for Mosaic layout

    in_specs = [
        pl.BlockSpec((V, tile, rgbf.shape[-1]), lambda t: (0, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((V, tile, neur.shape[-1]), lambda t: (0, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((V, tile, rdiff.shape[-1]), lambda t: (0, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((V, tile, 1), lambda t: (0, t, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_w]

    out_dtype = dtype
    fc, nv, x, vis = pl.pallas_call(
        functools.partial(_kernel, V=V, dtype=dtype),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tile, C_OUT), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, tile, C_X), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, tile, 1), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Np, C_OUT), out_dtype),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((V, Np, C_X), out_dtype),
            jax.ShapeDtypeStruct((V, Np, 1), out_dtype),
        ),
    )(rgbf, neur, rdiff, mask, *flat_w)
    if pad:
        fc, nv, x, vis = fc[:N], nv[:N], x[:, :N], vis[:, :N]
    return fc, nv, x, vis


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def view_fuse(rgbf, neur, rdiff, mask, weights, dtype=jnp.float32):
    """Fused per-view MLP stack. Forward on TPU = Pallas kernel; backward
    recomputes through the jnp reference (cheap; avoids storing the stack's
    intermediates). Inputs [V,N,C]; weights tuple of (kernel, bias) pairs in
    W_NAMES order; dtype = matmul compute dtype (params stay f32)."""
    return _view_fuse_pallas(rgbf, neur, rdiff, mask, weights, dtype)


def _vf_fwd(rgbf, neur, rdiff, mask, weights, dtype):
    out = _view_fuse_pallas(rgbf, neur, rdiff, mask, weights, dtype)
    return out, (rgbf, neur, rdiff, mask, weights)


def _vf_bwd(dtype, res, g):
    rgbf, neur, rdiff, mask, weights = res
    _, vjp = jax.vjp(
        lambda a, b, c, d, w: view_fuse_reference(a, b, c, d, w, dtype),
        rgbf, neur, rdiff, mask, weights)
    return vjp(g)


view_fuse.defvjp(_vf_fwd, _vf_bwd)
