"""Generalizable NeRF renderer + grasp network (ref: src/nr/network/renderer.py).

`NeuralRayRenderer` orchestrates the full pipeline on static-shape, channels-
last tensors:

    6 ref images ──ResUNet──> img_feats ┐
                 ──ResUNet──> ray_feats ├─VisEncoder─> refined ray_feats
    query rays ──inv-depth samples──> points ──project to views──> gathers
    gathers ──dist decoder──> per-view hit/vis ──prob embed┐
    gathers + embeds ──IBRNet-NeuS──> (rgb, sdf, ∇sdf) ──NeuS α──> composite
    40^3 grid ──same network (SDF only)──> TSDF volume ──3D CNN──> grasps

Everything is jit-compiled in one graph: no Python chunk loops on the hot path
(the reference iterates 4096-ray chunks and volume batches in Python —
renderer.py:201-220,164-199; here rays/voxels are a flat batch axis that
pjit/shard_map later shards across devices).

Data contract (all float32, channels-last):
  ref: imgs [V,H,W,3], poses [V,3,4] (world→cam), Ks [V,3,3],
       depth_range [V,2], bbox3d_min [3]
  que: coords [qn,rn,2] (x,y), poses [qn,3,4], Ks [qn,3,3],
       depth_range [qn,2], imgs [qn,H,W,3] (train only)
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import geometry
from ..ops.interpolate import interpolate_feats, interpolate_feature_map
from ..ops.fused_gather import pack_feature_maps, fused_epipolar_gather
from ..ops.tsdf import grid_points_device
from .nn_blocks import ResUNetLight, RayFeatInitNet, VisEncoder
from .dist_decoder import MixtureLogisticsDistDecoder, compute_prob
from .aggregator import NeusAggregationNet
from .grasp_head import VGNConvNet


def project_to_views(ref: Dict[str, jnp.ndarray], que_pts: jnp.ndarray,
                     img_feats: jnp.ndarray, ray_feats: jnp.ndarray,
                     packed: Optional[jnp.ndarray] = None):
    """Project query points into every reference view and gather features.

    que_pts [qn,rn,dn,3] → dict of [V,qn,rn,dn,C] tensors: dir(3), pts(2),
    depth(1), mask(1), ray_feats(32), rgb(3), img_feats(32).
    Mirrors ref render_ops.py:82-144 (project_points_dict).

    `packed` is the pack_feature_maps output; when given (the hot path) the
    three per-map gathers collapse into one windowed gather
    (ops/fused_gather.py — same values, ~5x faster on TPU). Without it the
    original three-gather oracle runs (kept as the parity reference).
    """
    qn, rn, dn, _ = que_pts.shape
    pts = que_pts.reshape(-1, 3)
    V, h, w, _ = ref["imgs"].shape
    xy, depth, valid = geometry.project_points(pts, ref["poses"], ref["Ks"], h, w)
    prj_dir = geometry.view_directions(pts, ref["poses"])

    if packed is not None:
        prj_rgb, prj_img_feats, prj_ray_feats = fused_epipolar_gather(
            packed, xy, valid, h, w)
    else:
        prj_ray_feats = interpolate_feature_map(ray_feats, xy, valid, h, w)
        prj_rgb = interpolate_feature_map(ref["imgs"], xy, valid, h, w)
        prj_img_feats = interpolate_feature_map(img_feats, xy, valid, h, w)

    def r(x):
        return x.reshape(V, qn, rn, dn, -1)

    return {"dir": r(prj_dir), "pts": r(xy), "depth": r(depth),
            "mask": r(valid.astype(jnp.float32)), "ray_feats": r(prj_ray_feats),
            "rgb": r(prj_rgb), "img_feats": r(prj_img_feats)}


class NeuralRayRenderer(nn.Module):
    """Config mirrors configs/nrvgn_sdf.yaml (the live reference config)."""
    depth_sample_num: int = 40
    fine_depth_sample_num: int = 40
    use_hierarchical_sampling: bool = True
    render_rgb: bool = True
    render_depth: bool = True
    do_sample_volume: bool = True
    volume_resolution: int = 40
    volume_size: float = 0.3
    use_ray_mask: bool = True
    ray_mask_view_num: int = 2
    ray_mask_point_num: int = 8
    depth_loss_coords_num: int = 8192
    use_depth_loss: bool = True
    init_s: float = 0.3
    # activation/compute dtype ("float32" | "bfloat16"); params stay float32,
    # geometry and compositing stay float32 regardless
    compute_dtype: str = "float32"
    # opt-in Pallas view-fuse kernel for the aggregators; OFF by default —
    # callers enable it only after probing it on their backend (bench.py)
    use_pallas: bool = False
    # name of the mesh axis to shard rays / TSDF-grid columns over (None =
    # let XLA decide); only meaningful inside jit under a Mesh context
    space_axis: Optional[str] = None

    def _shard_rays(self, x, dim: int = 1):
        """Constrain the ray axis of x to the space mesh axis."""
        if self.space_axis is None:
            return x
        from jax.sharding import PartitionSpec as P
        spec = [None] * x.ndim
        spec[dim] = self.space_axis
        return jax.lax.with_sharding_constraint(x, P(*spec))

    def setup(self):
        d = jnp.dtype(self.compute_dtype)
        self.image_encoder = ResUNetLight((1, 2, 6, 4), 32, 16,
                                          name="image_encoder", dtype=d)
        self.init_net = RayFeatInitNet(name="init_net", dtype=d)
        self.vis_encoder = VisEncoder(name="vis_encoder", dtype=d)
        self.dist_decoder = MixtureLogisticsDistDecoder(name="dist_decoder",
                                                        dtype=d)
        self.agg_net = NeusAggregationNet(init_s=self.init_s, name="agg_net",
                                          dtype=d,
                                          use_pallas=self.use_pallas)
        if self.use_hierarchical_sampling:
            self.fine_dist_decoder = MixtureLogisticsDistDecoder(
                name="fine_dist_decoder", dtype=d)
            self.fine_agg_net = NeusAggregationNet(init_s=self.init_s,
                                                   name="fine_agg_net",
                                                   dtype=d,
                                                   use_pallas=self.use_pallas)

    # ---------------------------------------------------------------- views
    def encode_views(self, ref):
        """Run the three CNNs once per scene; returns (img_feats, ray_feats)
        at quarter resolution (ref renderer.py:275-279). Feature maps are
        gathered in float32 for interpolation accuracy."""
        img_feats = self.image_encoder(ref["imgs"])
        ray_feats = self.init_net(ref["imgs"])
        ray_feats = self.vis_encoder(ray_feats, img_feats)
        return (img_feats.astype(jnp.float32), ray_feats.astype(jnp.float32))

    # ----------------------------------------------------------- ray render
    def _predict_ray_prob(self, decoder, prj, ref_depth_range, que_dists_inv):
        """Per-view mixture decode + hit/vis probabilities, mask-gated
        (ref renderer.py:62-78)."""
        mean, var, vis, aw = decoder(prj["ray_feats"])
        depth = prj["depth"][..., 0]
        if que_dists_inv is None:
            alpha, visibility, hit = compute_prob(
                depth, None, mean, var, vis, aw, ref_depth_range,
                fixed_interval=True, use_vis=decoder.use_vis)
        else:
            alpha, visibility, hit = compute_prob(
                depth, que_dists_inv[None], mean, var, vis, aw,
                ref_depth_range, use_vis=decoder.use_vis)
        prj = dict(prj)
        prj["vis"] = visibility[..., None] * prj["mask"]
        prj["hit_prob"] = hit[..., None] * prj["mask"]
        return prj

    def render_by_depth(self, que_depth, que, ref, img_feats, ray_feats,
                        is_fine: bool, train: bool, packed=None):
        """One full render pass at the given per-ray depths
        (ref renderer.py:110-138)."""
        dist_decoder = self.fine_dist_decoder if is_fine else self.dist_decoder
        agg_net = self.fine_agg_net if is_fine else self.agg_net

        que_dists_inv = geometry.depth2inv_dists(que_depth, que["depth_range"])
        que_pts, que_dir = geometry.depth2points(
            que["coords"], que["poses"], que["Ks"], que_depth)
        que_pts = self._shard_rays(que_pts)
        prj = project_to_views(ref, que_pts, img_feats, ray_feats, packed)
        prj = self._predict_ray_prob(dist_decoder, prj, ref["depth_range"],
                                     que_dists_inv)

        que_dists = geometry.depth2dists(que_depth)
        agg = agg_net(prj, que_dir, que_pts, que_dists)

        hit_prob = geometry.alpha2hit_prob(agg["alpha"])
        out = {
            "alpha_values": agg["alpha"],
            "colors_nr": agg["colors"],
            "hit_prob_nr": hit_prob,
            "pixel_colors_nr": geometry.composite(hit_prob, agg["colors"]),
            "sdf_values": agg["sdf"],
            "sdf_gradient_error": agg["grad_error"],
            "s": agg["s"],
        }
        if "imgs" in que:
            out["pixel_colors_gt"] = interpolate_feats(
                que["imgs"], que["coords"], align_corners=True)
        if self.use_ray_mask:
            m = jnp.sum(prj["mask"], 0) > self.ray_mask_view_num  # qn,rn,dn,1
            out["ray_mask"] = (jnp.sum(m, 2) > self.ray_mask_point_num)[..., 0]
        if self.render_depth:
            out["render_depth"] = jnp.sum(hit_prob * que_depth, -1)
        return out

    def render_rays(self, que, ref, img_feats, ray_feats, train: bool,
                    key=None, packed=None):
        """Coarse + hierarchical fine rendering (ref renderer.py:140-162)."""
        qn, rn, _ = que["coords"].shape
        que_depth = geometry.sample_depth(que["depth_range"], rn,
                                          self.depth_sample_num)
        out = self.render_by_depth(que_depth, que, ref, img_feats, ray_feats,
                                   False, train, packed)
        if self.use_hierarchical_sampling:
            fine_depth = geometry.sample_fine_depth(
                que_depth, jax.lax.stop_gradient(out["hit_prob_nr"]),
                que["depth_range"], self.fine_depth_sample_num,
                key if train else None)
            fine_depth = jnp.sort(fine_depth, -1)
            fine = self.render_by_depth(fine_depth, que, ref, img_feats,
                                        ray_feats, True, train, packed)
            out.update({k + "_fine": v for k, v in fine.items()})
        return out

    # --------------------------------------------------------------- volume
    def sample_volume(self, ref, img_feats, ray_feats, packed=None):
        """Evaluate the SDF on the 40^3 workspace grid (ref renderer.py:164-199).

        Grid is laid out as qn=1, rn=res^2 "rays" of dn=res samples each, so the
        ray attention runs along each z-column; sampled top-down (z flipped in,
        volume flipped back on output). Returns [res,res,res] (x,y,z order).
        """
        res = self.volume_resolution
        pts = grid_points_device(res, self.volume_size) + ref["bbox3d_min"]
        que_pts = pts.reshape(1, res * res, res, 3)[:, :, ::-1]
        que_pts = self._shard_rays(que_pts)

        if packed is None:
            packed = pack_feature_maps(ref["imgs"], img_feats, ray_feats,
                                       jnp.dtype(self.compute_dtype))
        prj = project_to_views(ref, que_pts, img_feats, ray_feats, packed)
        prj = self._predict_ray_prob(self.dist_decoder, prj,
                                     ref["depth_range"], None)
        que_dir = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0]), (1, res * res, res, 3))
        agg = self.agg_net(prj, que_dir, que_pts, None)
        vol = agg["sdf"].reshape(res, res, res)
        return vol[:, :, ::-1]

    # ---------------------------------------------------------- depth means
    def predict_mean_for_depth_loss(self, ref, ray_feats, key):
        """Mixture means at random pixels for depth supervision
        (ref renderer.py:222-266; coords here are proper (x,y) over the full
        image — the reference emits (y,x) which both its prediction and GT
        gathers consistently misread, confining samples to a sub-rectangle)."""
        V, h, w, _ = ref["imgs"].shape
        n = min(self.depth_loss_coords_num, h * w)
        idx = jax.random.choice(key, h * w, (n,), replace=False)
        coords = jnp.stack([(idx % w).astype(jnp.float32),
                            (idx // w).astype(jnp.float32)], -1)  # n,2 (x,y)
        coords = jnp.broadcast_to(coords[None], (V, n, 2))
        mask = jnp.ones((V, n), jnp.float32)
        feats = interpolate_feature_map(ray_feats, coords, mask, h, w)
        out = {"depth_coords": coords,
               "depth_mean_all": self.dist_decoder.predict_mean(feats)}
        out["depth_mean"] = out["depth_mean_all"][..., 0]
        out["depth_mean_2"] = out["depth_mean_all"][..., 1]
        if self.use_hierarchical_sampling:
            fine = self.fine_dist_decoder.predict_mean(feats)
            out["depth_mean_fine"] = fine[..., 0]
            out["depth_mean_fine_2"] = fine[..., 1]
        return out

    # -------------------------------------------------------------- forward
    def __call__(self, data: Dict[str, Any], train: bool = False,
                 key: Optional[jax.Array] = None):
        ref, que = data["ref"], data.get("que")
        img_feats, ray_feats = self.encode_views(ref)
        packed = pack_feature_maps(ref["imgs"], img_feats, ray_feats,
                                   jnp.dtype(self.compute_dtype))

        out = {}
        if self.render_rgb and que is not None:
            k_fine = k_depth = None
            if key is not None:
                k_fine, k_depth = jax.random.split(key)
            out = self.render_rays(que, ref, img_feats, ray_feats, train,
                                   k_fine, packed)
        else:
            k_depth = key
        if self.do_sample_volume:
            out["volume"] = self.sample_volume(ref, img_feats, ray_feats,
                                               packed)
        if self.use_depth_loss and k_depth is not None:
            out.update(self.predict_mean_for_depth_loss(ref, ray_feats,
                                                        k_depth))
        return out


class GraspNeRF(nn.Module):
    """Renderer + VGN 3D-CNN grasp head (ref renderer.py:293-331).

    The reference's step-gated NR freezing paths are dead in the live config
    (`nr_initial_training_steps: 0`, and the non-default branches hit a latent
    `super().forward` bug — renderer.py:315,320); only the joint path exists
    here.
    """
    renderer_cfg: Dict[str, Any] = None

    def setup(self):
        cfg = dict(self.renderer_cfg or {})
        self.nr_net = NeuralRayRenderer(**cfg, name="nr_net")
        self.vgn_net = VGNConvNet(
            name="vgn_net",
            dtype=jnp.dtype(cfg.get("compute_dtype", "float32")))

    def __call__(self, data, train: bool = False, key=None):
        out = self.nr_net(data, train=train, key=key)
        vol = out["volume"][None, ..., None]  # [1,res,res,res,1]
        qual, rot, width = self.vgn_net(vol)
        out["vgn_pred_full"] = (qual, rot, width)
        if "grasp_index" in data:
            idx = data["grasp_index"]  # [n,3] voxel indices
            b = jnp.zeros(idx.shape[0], jnp.int32)
            out["vgn_pred"] = (
                qual[b, idx[:, 0], idx[:, 1], idx[:, 2], 0],
                rot[b, idx[:, 0], idx[:, 1], idx[:, 2], :],
                width[b, idx[:, 0], idx[:, 1], idx[:, 2], 0],
            )
        return out
