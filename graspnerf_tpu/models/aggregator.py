"""NeuS SDF aggregation head (ref: src/nr/network/aggregate_net.py, neus.py).

Builds per-(point, view) embeddings from the projection dictionary, runs the
IBRNet-NeuS epipolar aggregator, and converts SDF to opacity with the NeuS
logistic-CDF alpha using a single learned sharpness parameter.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .ibrnet import IBRNetNeus


def dir_diff_feature(prj_dir, que_dir):
    """[V,qn,rn,dn,3] x [qn,rn,dn,3] -> [V, qn*rn*dn, 4]
    (direction difference ++ dot; ref: aggregate_net.py:11-17). Stays in the
    views-leading layout — no transpose between the gathers and the MLPs."""
    V = prj_dir.shape[0]
    diff = prj_dir - que_dir[None]
    dot = jnp.sum(prj_dir * que_dir[None], -1, keepdims=True)
    feat = jnp.concatenate([diff, dot], -1)
    return feat.reshape(V, -1, 4)


def to_vnc(x):
    """[V,qn,rn,dn,C] -> [V, qn*rn*dn, C] (the aggregation layout; free)."""
    V, qn, rn, dn, C = x.shape
    return x.reshape(V, qn * rn * dn, C)


class SingleVariance(nn.Module):
    """Learned NeuS sharpness: inv_s = exp(10 * variance) (ref: neus.py:6-19).

    The reference freezes `variance` for the first `fix_s` steps (0 in the
    shipped config, i.e. trainable from step 1); here it is always trainable.
    """
    init_val: float = 0.3

    @nn.compact
    def __call__(self):
        v = self.param("variance", lambda k: jnp.asarray(self.init_val, jnp.float32))
        return jnp.clip(jnp.exp(v * 10.0), 1e-6, 1e6), v


def neus_alpha(sdf, grad, que_dir, que_dists, inv_s, cos_anneal_ratio=1.0):
    """SDF → per-sample alpha (ref: aggregate_net.py:105-123).

    sdf [qn,rn,dn]; grad [qn,rn,dn,3] (∇sdf w.r.t. points); que_dir
    [qn,rn,dn,3]; que_dists [qn,rn,dn] sample intervals; inv_s scalar.
    """
    true_cos = jnp.sum(-que_dir * grad, -1)
    iter_cos = -(nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
                 + nn.relu(-true_cos) * cos_anneal_ratio)
    est_next = sdf + iter_cos * que_dists * 0.5
    est_prev = sdf - iter_cos * que_dists * 0.5
    prev_cdf = nn.sigmoid(est_prev * inv_s)
    next_cdf = nn.sigmoid(est_next * inv_s)
    p = prev_cdf - next_cdf
    return jnp.clip((p + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)


class NeusAggregationNet(nn.Module):
    """prob-embed + IBRNetNeus + NeuS alpha (ref: aggregate_net.py:87-140).

    Inputs are the projection dict tensors in [V,qn,rn,dn,C] layout plus query
    directions/points; que_dists None → SDF-only evaluation (volume queries).
    Returns dict with alpha, sdf, colors, grad_error, s.
    """
    neuray_dim: int = 32
    init_s: float = 0.3
    dtype: Any = jnp.float32
    # opt-in Pallas view-fuse kernel (see IBRNetNeus.use_pallas)
    use_pallas: bool = False

    def setup(self):
        self.prob_embed_0 = nn.Dense(self.neuray_dim, name="prob_embed.0",
                                     dtype=self.dtype)
        self.prob_embed_2 = nn.Dense(self.neuray_dim, name="prob_embed.2",
                                     dtype=self.dtype)
        self.agg_impl = IBRNetNeus(self.neuray_dim, name="agg_impl",
                                   dtype=self.dtype,
                                   use_pallas=self.use_pallas)
        self.deviation_network = SingleVariance(self.init_s,
                                                name="deviation_network")

    def __call__(self, prj, que_dir, que_pts, que_dists=None,
                 cos_anneal_ratio=1.0):
        qn, rn, dn, _ = que_pts.shape
        hit_val = (prj["hit_prob"] - 0.5) * 2
        vis_val = (prj["vis"] - 0.5) * 2
        pe = jnp.concatenate([prj["ray_feats"], hit_val, vis_val],
                             -1).astype(self.dtype)
        pe = self.prob_embed_2(nn.relu(self.prob_embed_0(pe)))

        if que_dir is not None:
            dir_diff = dir_diff_feature(prj["dir"], que_dir)
        else:
            V = prj["dir"].shape[0]
            dir_diff = jnp.zeros((V, qn * rn * dn, 4), pe.dtype)
        valid_mask = to_vnc(prj["mask"])
        img_feats = to_vnc(jnp.concatenate([prj["rgb"], prj["img_feats"]], -1))
        prob_embedding = to_vnc(pe)

        colors, sdf, grad = self.agg_impl(img_feats, prob_embedding, dir_diff,
                                          valid_mask, que_pts, (qn * rn, dn))
        sdf = sdf[..., 0].reshape(qn, rn, dn).astype(jnp.float32)
        colors = colors.reshape(qn, rn, dn, 3).astype(jnp.float32)
        out = {"sdf": sdf, "colors": colors, "grad": grad}
        if que_dists is None:
            return out

        inv_s, s_raw = self.deviation_network()
        grad = grad.astype(jnp.float32)
        out["alpha"] = neus_alpha(sdf, grad, que_dir, que_dists, inv_s,
                                  cos_anneal_ratio)
        gnorm = jnp.linalg.norm(grad, axis=-1)
        out["grad_error"] = jnp.mean((gnorm - 1.0) ** 2).reshape(1, 1)
        out["s"] = s_raw.reshape(1, 1)
        return out
