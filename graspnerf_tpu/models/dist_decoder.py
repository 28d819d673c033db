"""Mixture-of-logistics ray-distribution decoder (ref: src/nr/network/dist_decoder.py).

Per-pixel MLPs decode a view's 32-ch ray feature into a 2-component logistic
mixture over normalized inverse depth (mean, inv-scale 'var', mix weight 'aw',
optional visibility). `compute_prob` turns projected sample depths plus the
mixture into per-sample (alpha_value, visibility, hit_prob) — all shapes static,
fully batched over (view, point).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..ops import geometry


class MixtureLogisticsDistDecoder(nn.Module):
    """Returns (mean [..,2], var [..,2], vis [..,1]|None, aw [..,1])."""
    feats_dim: int = 32
    bias_val: float = 0.05
    use_vis: bool = False  # shipped config: configs/nrvgn_sdf.yaml use_vis false
    dtype: Any = jnp.float32

    def setup(self):
        def head(prefix, out_dim):
            return (nn.Dense(self.feats_dim, name=f"{prefix}.0",
                             dtype=self.dtype),
                    nn.Dense(self.feats_dim, name=f"{prefix}.2",
                             dtype=self.dtype),
                    nn.Dense(out_dim, name=f"{prefix}.4", dtype=self.dtype))
        self.mean_layers = head("mean_decoder", 2)
        self.var_layers = head("var_decoder", 2)
        self.aw_layers = head("aw_decoder", 1)
        if self.use_vis:
            self.vis_layers = head("vis_decoder", 1)

    @staticmethod
    def _run(layers, x):
        l0, l1, l2 = layers
        return l2(nn.elu(l1(nn.elu(l0(x)))))

    def __call__(self, feats):
        feats = feats.astype(self.dtype)
        f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
        mean = nn.softplus(f32(self._run(self.mean_layers, feats)))
        var = nn.softplus(f32(self._run(self.var_layers, feats))) + self.bias_val
        aw = nn.sigmoid(f32(self._run(self.aw_layers, feats)))
        vis = None
        if self.use_vis:
            vis = nn.sigmoid(f32(self._run(self.vis_layers, feats)))
        return mean, var, vis, aw

    def predict_mean(self, feats):
        feats = feats.astype(self.dtype)
        return nn.softplus(
            self._run(self.mean_layers, feats).astype(jnp.float32))


def compute_prob(depth, interval, mean, var, vis, aw, depth_range,
                 fixed_interval: bool = False, fixed_interval_val: float = 0.01,
                 use_vis: bool = False, eps: float = 1e-5):
    """Mixture CDF difference over each sample's [near, far) inverse-depth bin.

    depth [rfn,qn,rn,dn] metric projected depths; interval [1,qn,rn,dn] widths in
    normalized inverse-depth space (ignored when fixed_interval); mean/var
    [rfn,qn,rn,dn,2], aw [rfn,qn,rn,dn,1]; depth_range [rfn,2].
    Returns (alpha_value, visibility, hit_prob), each [rfn,qn,rn,dn].
    Mirrors ref dist_decoder.py:109-142 (tanh-CDF logistic mixture, log-odds
    alpha).
    """
    if fixed_interval:
        near, far = geometry.near_far_bounds_fixed(depth, depth_range,
                                                   fixed_interval_val)
    else:
        near, far = geometry.near_far_bounds_ref(depth, interval, depth_range)
    mix = jnp.concatenate([aw, 1.0 - aw], -1)
    near = near[..., None]
    far = far[..., None]
    cdf0 = 0.5 + 0.5 * jnp.tanh((near - mean) * var)
    cdf1 = 0.5 + 0.5 * jnp.tanh((far - mean) * var)
    if use_vis:
        cdf0 = cdf0 * vis
        cdf1 = cdf1 * vis
    visibility = jnp.sum((1.0 - cdf0) * mix, -1)
    hit_prob = jnp.sum((cdf1 - cdf0) * mix, -1)
    alpha_value = jnp.log(hit_prob / (visibility - hit_prob + eps) + eps)
    return alpha_value, visibility, hit_prob
