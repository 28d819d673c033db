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


# Packed-lane layout (all non-linear work stays in f32 inside the kernel:
# Mosaic's bf16 lowerings of `logistic` and `cmpf` are broken on v5e — the
# round-3 failures — so bf16 is confined to the MXU matmul inputs).
C_IN = C_RGBF + C_NEUR + C_DIFF + 1   # 72: rgbf | neur | rdiff | mask
C_O1 = C_OUT + 1                      # 66: feat_const | num_valid
C_O2 = C_X + 1                        # 33: x | vis


def _kernel(pin_ref,
            wd0k, wd0b, wd1k, wd1b, wn0k, wn0b, wn1k, wn1b,
            wb0k, wb0b, wb1k, wb1b, wv0k, wv0b, wv1k, wv1b,
            wv20k, wv20b, wv21k, wv21b,
            o1_ref, o2_ref, *, V: int, T: int, dtype):
    """Views-flattened kernel (round-4 perf shape): the V=6 source views are
    folded into the ROW axis, so every MLP layer is ONE [V*T, C] matmul
    instead of six [T, C] ones — 6x fewer, 6x larger MXU ops (the per-view
    unrolled variant measured 3.6 ms vs XLA's 1.2 ms for the 40^3 volume
    workload; tiny matmuls can't occupy the MXU). Cross-view reductions are
    sums over row slices v*T:(v+1)*T — sublane-aligned, VPU-cheap. Live set:
    a handful of [V*T, <=256-lane] tensors; fits 16 MB scoped VMEM at T=512.

    All nonlinearities run in f32: Mosaic's bf16 `logistic` and `cmpf`
    lowerings are broken on v5e (the round-3 on-chip failures), so bf16 is
    confined to MXU matmul inputs."""

    def mm(x, kref, bref):
        y = jax.lax.dot_general(
            x.astype(dtype), kref[:].astype(dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return y + bref[:].astype(jnp.float32)   # stays f32

    def vsum_rows(x):
        """[V*T, C] -> sum over the view groups -> [T, C]."""
        acc = x[:T]
        for v in range(1, V):
            acc = acc + x[v * T:(v + 1) * T]
        return acc

    def vtile(x):
        """[T, C] -> repeat for every view group -> [V*T, C]."""
        return jnp.concatenate([x] * V, 0)

    X = pin_ref[:].reshape(V * T, C_IN).astype(jnp.float32)
    rgbf = X[:, :C_RGBF]
    neur = X[:, C_RGBF:C_RGBF + C_NEUR]
    rdiff = X[:, C_RGBF + C_NEUR:C_RGBF + C_NEUR + C_DIFF]
    msk = X[:, C_IN - 1:C_IN]

    # nv must stay exact — downstream gates compare num_valid < 1 / > 1
    nv = vsum_rows(msk)                    # [T,1]
    inv_msum = vtile(1.0 / (nv + 1e-8))    # [V*T,1]
    weight = msk * inv_msum

    df = _elu(mm(_elu(mm(rdiff, wd0k, wd0b)), wd1k, wd1b))
    rf = rgbf + df                          # [V*T,35]
    w0 = jax.nn.sigmoid(mm(_elu(mm(neur, wn0k, wn0b)), wn1k, wn1b)) * weight

    mean0 = vsum_rows(rf * w0)
    mean1 = vsum_rows(rf * weight)
    var0 = vsum_rows(w0 * (rf - vtile(mean0)) ** 2)
    var1 = vsum_rows(weight * (rf - vtile(mean1)) ** 2)
    gf = jnp.concatenate([mean0, var0, mean1, var1], -1)  # [T,140]

    xin = jnp.concatenate([vtile(gf), rf, neur], -1)      # [V*T,207]
    x = _elu(mm(_elu(mm(xin, wb0k, wb0b)), wb1k, wb1b))
    xv = _elu(mm(_elu(mm(x * weight, wv0k, wv0b)), wv1k, wv1b))
    x = x + xv[:, :C_X]
    vis = jax.nn.sigmoid(xv[:, C_X:]) * msk
    vis = jax.nn.sigmoid(
        mm(_elu(mm(x * vis, wv20k, wv20b)), wv21k, wv21b)) * msk
    o2_ref[:] = jnp.concatenate([x, vis], -1).reshape(
        V, T, C_O2).astype(o2_ref.dtype)

    w2 = vis * vtile(1.0 / (vsum_rows(vis) + 1e-8))
    mean = vsum_rows(x * w2)
    wmean = vsum_rows(w2)
    var = vsum_rows(w2 * (x - vtile(mean)) ** 2)
    o1_ref[:] = jnp.concatenate([mean, var, wmean / V, nv], -1)


def _view_fuse_pallas(rgbf, neur, rdiff, mask, weights, dtype,
                      tile: int = 512):
    V, N, _ = rgbf.shape
    pin = jnp.concatenate(
        [rgbf.astype(dtype), neur.astype(dtype), rdiff.astype(dtype),
         mask.astype(dtype)], -1)                # [V, N, 72] one padded tile
    pad = (-N) % tile
    if pad:
        pin = jnp.pad(pin, ((0, 0), (0, pad), (0, 0)))
    Np = N + pad
    nt = Np // tile

    flat_w = []
    for k, b in weights:
        flat_w += [k, b.reshape(1, -1)]  # 2D biases for Mosaic layout

    in_specs = [
        pl.BlockSpec((V, tile, C_IN), lambda t: (0, t, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_w]

    o1, o2 = pl.pallas_call(
        functools.partial(_kernel, V=V, T=tile, dtype=dtype),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tile, C_O1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, tile, C_O2), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Np, C_O1), jnp.float32),
            # x|vis in the compute dtype (halves the VMEM block in bf16)
            jax.ShapeDtypeStruct((V, Np, C_O2), dtype),
        ),
    )(pin, *flat_w)
    fc = o1[:N, :C_OUT].astype(dtype)
    nv = o1[:N, C_OUT:]
    x = o2[:, :N, :C_X].astype(dtype)
    vis = o2[:, :N, C_X:].astype(dtype)
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
