"""Epipolar aggregation network — IBRNet-with-NeuRay, NeuS variant.

Re-design of the reference's hot-loop MLP stack (ref: src/nr/network/ibrnet.py:
373-513 IBRNetWithNeuRayNeus, :52-116 attention + fused_mean_variance) as a
functional flax module operating on [V, N, C] tensors (V source views leading,
N = rays*samples flattened, C channels) — the natural layout of the projected
feature dict, so no transposes sit between the gathers and the MLPs.

The per-view MLP stack + cross-view fusion (everything up to the geometry and
color heads) has two interchangeable implementations:
  * flax submodules (CPU / init / parity oracle), and
  * a Pallas TPU kernel (ops/pallas/ibrnet_fuse.py) that keeps all
    intermediates in VMEM — used automatically on accelerator backends;
    backward runs through the jnp reference via custom_vjp.

∇sdf: the reference calls torch.autograd.grad(sdf, que_pts) where que_pts only
enters the recorded graph through the positional embedding (requires_grad is
set *after* the projection features were computed — ibrnet.py:485-504). Here
that is an explicit `jax.vjp` of the geometry branch w.r.t. the query points,
with the view-aggregated features closed over; the vjp is itself differentiable,
which gives the double-backward needed by the eikonal loss.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pallas.ibrnet_fuse import view_fuse


def positional_table(n_samples: int, d_hid: int = 16) -> np.ndarray:
    """Sinusoid table [1, n_samples, d_hid] (ref: ibrnet.py:437-445)."""
    pos = np.arange(n_samples)[:, None]
    j = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2 * (j // 2) / d_hid)
    table = np.where(j % 2 == 0, np.sin(angle), np.cos(angle))
    return table[None].astype(np.float32)


def embed_points(pts: jnp.ndarray, multires: int = 3) -> jnp.ndarray:
    """NeRF positional encoding, include-input, log-sampled freqs
    (ref: neus.py:21-66): [..., 3] -> [..., 3 + 3*2*multires]."""
    out = [pts]
    for i in range(multires):
        freq = 2.0 ** i
        out.append(jnp.sin(pts * freq))
        out.append(jnp.cos(pts * freq))
    return jnp.concatenate(out, -1)


def weighted_mean_var(x, weight, axis=0):
    """Weighted mean/variance along the view axis (ref: ibrnet.py:112-116)."""
    mean = jnp.sum(x * weight, axis=axis, keepdims=True)
    var = jnp.sum(weight * (x - mean) ** 2, axis=axis, keepdims=True)
    return mean, var


class MultiHeadAttention(nn.Module):
    """Post-LN multi-head attention along the sample axis (ref: ibrnet.py:52-102).

    q/k/v [B, L, d_model]; mask [B, L, 1] masks *query rows* (broadcast over
    keys, exactly as the reference's masked_fill does).
    """
    n_head: int = 4
    d_model: int = 16
    d_k: int = 4
    d_v: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        B, L, _ = q.shape
        residual = q
        dd = dict(use_bias=False, dtype=self.dtype)
        qh = nn.Dense(self.n_head * self.d_k, name="w_qs", **dd)(q)
        kh = nn.Dense(self.n_head * self.d_k, name="w_ks", **dd)(k)
        vh = nn.Dense(self.n_head * self.d_v, name="w_vs", **dd)(v)
        qh = qh.reshape(B, L, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        kh = kh.reshape(B, L, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        vh = vh.reshape(B, L, self.n_head, self.d_v).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", qh / (self.d_k ** 0.5), kh)
        if mask is not None:
            row = mask[:, None, :, :]  # B,1,L,1 → masks query rows
            attn = jnp.where(row == 0, -1e9, attn)
        attn = jax.nn.softmax(attn, -1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.n_head * self.d_v)
        out = nn.Dense(self.d_model, use_bias=False, name="fc",
                       dtype=self.dtype)(out) + residual
        return nn.LayerNorm(epsilon=1e-6, name="layer_norm",
                            dtype=self.dtype)(out)


class _Seq(nn.Module):
    """Dense stack named like a torch Sequential ("0", "2", ...); the parent's
    attribute name supplies the torch prefix. acts: 'elu'|'sigmoid'|None."""
    dims: tuple
    acts: tuple
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, (d, a) in enumerate(zip(self.dims, self.acts)):
            x = nn.Dense(d, name=str(2 * i), dtype=self.dtype)(x)
            if a == "elu":
                x = nn.elu(x)
            elif a == "sigmoid":
                x = nn.sigmoid(x)
        return x


class IBRNetNeus(nn.Module):
    """Inputs ([V, N, C] layout, V source views, N = R*D points):
      rgb_feat    [V, N, 3+f]   (rgb ++ image features, f=32)
      neuray_feat [V, N, nf]    (prob embedding, nf=32)
      ray_diff    [V, N, 4]     (dir difference ++ dot)
      mask        [V, N, 1]
      que_pts     [Q, R', D, 3] with Q*R'*D == N
    Returns (rgb [R,D,3], sdf [R,D,1], grad_pts [Q,R',D,3]) where R=Q*R'.
    """
    neuray_in_dim: int = 32
    in_feat_ch: int = 32
    dtype: Any = jnp.float32
    # Kill switch for the Pallas view-fuse kernel (ops/pallas/ibrnet_fuse.py).
    # Defaults OFF: the oracle flax path must always work; the kernel is an
    # opt-in optimization enabled by callers that have verified it on their
    # backend (bench.py probes compile+parity on the real chip first).
    use_pallas: bool = False

    def setup(self):
        f = self.in_feat_ch
        d = self.dtype
        self.ray_dir_fc = _Seq((16, f + 3), ("elu", "elu"), d)
        self.base_fc = _Seq((64, 32), ("elu", "elu"), d)
        self.vis_fc = _Seq((32, 33), ("elu", "elu"), d)
        self.vis_fc2 = _Seq((32, 1), ("elu", "sigmoid"), d)
        self.geometry_fc = _Seq((64, 16), ("elu", "elu"), d)
        self.ray_attention = MultiHeadAttention(name="ray_attention", dtype=d)
        self.rgb_fc = _Seq((16, 8, 1), ("elu", "elu", None), d)
        self.neuray_fc = _Seq((8, 1), ("elu", None), d)
        # out_geometry_fc: two stacked Linears with NO activation between
        # (ref: ibrnet.py:410-412)
        self.out_geo_0 = nn.Dense(16, name="out_geometry_fc.0", dtype=d)
        self.out_geo_1 = nn.Dense(1, name="out_geometry_fc.1", dtype=d)

    # ------------------------------------------------- view-fusion section
    def _view_fuse_modules(self, rgb_feat, neuray_feat, ray_diff, mask):
        """Oracle path through the flax submodules (also creates params)."""
        direction_feat = self.ray_dir_fc(ray_diff)
        rgb_feat = rgb_feat + direction_feat

        weight = mask / (jnp.sum(mask, 0, keepdims=True) + 1e-8)
        weight0 = nn.sigmoid(self.neuray_fc(neuray_feat)) * weight
        mean0, var0 = weighted_mean_var(rgb_feat, weight0, 0)
        mean1, var1 = weighted_mean_var(rgb_feat, weight, 0)
        globalfeat = jnp.concatenate([mean0, var0, mean1, var1], -1)

        V, N = rgb_feat.shape[:2]
        x = jnp.concatenate(
            [jnp.broadcast_to(globalfeat, (V, N, globalfeat.shape[-1])),
             rgb_feat, neuray_feat], -1)
        x = self.base_fc(x)

        x_vis = self.vis_fc(x * weight)
        x_res, vis = x_vis[..., :-1], x_vis[..., -1:]
        vis = nn.sigmoid(vis) * mask
        x = x + x_res
        vis = self.vis_fc2(x * vis) * mask
        weight = vis / (jnp.sum(vis, 0, keepdims=True) + 1e-8)

        mean, var = weighted_mean_var(x, weight, 0)
        feat_const = jnp.concatenate(
            [mean[0], var[0], jnp.mean(weight, 0)], -1)  # [N,65]
        num_valid = jnp.sum(mask, 0)  # [N,1]
        return feat_const, num_valid, x, vis

    def _collect_weights(self):
        p = self.variables["params"]

        def kb(seq, idx):
            m = p[seq][str(idx)]
            return (m["kernel"], m["bias"])

        return (kb("ray_dir_fc", 0), kb("ray_dir_fc", 2),
                kb("neuray_fc", 0), kb("neuray_fc", 2),
                kb("base_fc", 0), kb("base_fc", 2),
                kb("vis_fc", 0), kb("vis_fc", 2),
                kb("vis_fc2", 0), kb("vis_fc2", 2))

    # ---------------------------------------------------- geometry section
    def _geometry(self, feat_const, pts, num_valid, pos_enc):
        """SDF from aggregated features + point embedding. pts [Q,R',D,3];
        feat_const [R,D,65], num_valid [R,D,1]."""
        R, D, _ = feat_const.shape
        embed = embed_points(pts).reshape(R, D, -1).astype(feat_const.dtype)
        g = jnp.concatenate([feat_const, embed], -1)
        g = self.geometry_fc(g)
        g = g + pos_enc
        row_mask = (num_valid > 1).astype(g.dtype)  # R,D,1
        g = self.ray_attention(g, g, g, mask=row_mask)
        sdf = jnp.clip(self.out_geo_1(self.out_geo_0(g)).astype(jnp.float32),
                       -1.0, 1.0)
        return jnp.where(num_valid < 1, 1.0, sdf)  # R,D,1

    def __call__(self, rgb_feat, neuray_feat, ray_diff, mask, que_pts,
                 rd: Tuple[int, int]):
        R, D = rd
        rgb_feat = rgb_feat.astype(self.dtype)
        neuray_feat = neuray_feat.astype(self.dtype)
        ray_diff = ray_diff.astype(self.dtype)
        mask = mask.astype(self.dtype)
        rgb_in = rgb_feat[..., :3]

        if self.is_initializing() or not self.use_pallas:
            feat_const, num_valid, x, vis = self._view_fuse_modules(
                rgb_feat, neuray_feat, ray_diff, mask)
        else:
            feat_const, num_valid, x, vis = view_fuse(
                rgb_feat, neuray_feat, ray_diff, mask,
                self._collect_weights(), jnp.dtype(self.dtype))

        feat_const = feat_const.reshape(R, D, -1)
        num_valid = num_valid.reshape(R, D, 1)
        pos_enc = jnp.asarray(positional_table(D)).astype(self.dtype)

        if self.is_initializing():
            # create the geometry-branch params outside the vjp trace
            self._geometry(feat_const, que_pts, num_valid, pos_enc)
        sdf, vjp_fn = jax.vjp(
            lambda p: self._geometry(feat_const, p, num_valid, pos_enc),
            que_pts)
        grad_pts, = vjp_fn(jnp.ones_like(sdf))

        h = jnp.concatenate([x, vis, ray_diff], -1)  # [V,N,37]
        h = self.rgb_fc(h)
        h = jnp.where(mask == 0, -1e9, h)
        blend = jax.nn.softmax(h.astype(jnp.float32), 0)
        rgb_out = jnp.sum(rgb_in.astype(jnp.float32) * blend, 0)
        return rgb_out.reshape(R, D, 3), sdf, grad_pts
