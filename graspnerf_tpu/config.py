"""YAML config system + registries (ref: utils/base_utils.py:316-319 load_cfg
and the name2* registries spread across the reference).

The reference merges YAML dicts over per-class default dicts at every level
(trainer/renderer/decoder/...). Here one flat YAML (same keys as
configs/nrvgn_sdf.yaml where applicable) is translated into the constructor
kwargs of the flax modules and the Trainer. See configs/nrvgn_sdf.yaml in this
repo for the shipped equivalent of the reference config.
"""
from __future__ import annotations

from typing import Any, Dict

import yaml


def load_cfg(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def renderer_cfg_from(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Map reference-style config keys → NeuralRayRenderer kwargs."""
    agg = cfg.get("agg_net_cfg", {}) or {}
    out = {}
    mapping = {
        "depth_sample_num": "depth_sample_num",
        "fine_depth_sample_num": "fine_depth_sample_num",
        "use_hierarchical_sampling": "use_hierarchical_sampling",
        "render_rgb": "render_rgb",
        "render_depth": "render_depth",
        "sample_volume": "do_sample_volume",
        "volume_resolution": "volume_resolution",
        "use_depth_loss": "use_depth_loss",
        "depth_loss_coords_num": "depth_loss_coords_num",
        "use_ray_mask": "use_ray_mask",
        "ray_mask_view_num": "ray_mask_view_num",
        "ray_mask_point_num": "ray_mask_point_num",
        "compute_dtype": "compute_dtype",
        "use_pallas": "use_pallas",
    }
    for src, dst in mapping.items():
        if src in cfg:
            out[dst] = cfg[src]
    if "init_s" in agg:
        out["init_s"] = agg["init_s"]
    return out


def trainer_cfg_from(cfg: Dict[str, Any]) -> Dict[str, Any]:
    lr = cfg.get("lr_cfg", {}) or {}
    out = {
        "total_steps": cfg.get("total_step", 500_000),
        "val_interval": cfg.get("val_interval", 5000),
        "key_metric": cfg.get("key_metric_name", "loss_vgn"),
    }
    if lr:
        out["lr_cfg"] = {
            "lr_init": float(lr.get("lr_init", 1e-4)),
            "decay_step": int(lr.get("decay_step", 100_000)),
            "decay_rate": float(lr.get("decay_rate", 0.5)),
        }
    return out


# string registries, extensible like the reference's name2network etc.
name2network: Dict[str, Any] = {}
name2dataset: Dict[str, Any] = {}
name2planner: Dict[str, Any] = {}


def register(registry: Dict[str, Any], name: str):
    def deco(cls):
        registry[name] = cls
        return cls
    return deco


def _populate():
    from .models import GraspNeRF, NeuralRayRenderer
    from .data import SyntheticSceneDataset
    from .detect import GraspNeRFPlanner
    name2network.setdefault("grasp_nerf", GraspNeRF)
    name2network.setdefault("neural_ray_renderer", NeuralRayRenderer)
    name2dataset.setdefault("synthetic", SyntheticSceneDataset)
    name2planner.setdefault("grasp_nerf", GraspNeRFPlanner)


def build_network(cfg: Dict[str, Any]):
    _populate()
    cls = name2network[cfg.get("network", "grasp_nerf")]
    return cls(renderer_cfg=renderer_cfg_from(cfg))
