"""PyTorch reference checkpoint → flax param pytree converter.

Every flax submodule in graspnerf_tpu.models is named with the exact torch
state-dict prefix of its reference counterpart (e.g. "layer1.0.conv1",
"ray_attention.w_qs"), so conversion is a mechanical walk of the flax tree:

  torch key = '.'.join(flax path names) + suffix
    kernel → weight (transposed to channels-last layouts)
    scale  → weight (norm affine)
    bias   → bias
    other  → the param's own name (e.g. deviation_network.variance)

Used by tests for golden parity against randomly-initialised reference modules
and by scripts/convert_checkpoint.py for real reference checkpoints
(ref: trainer.py:199-218 saves {'network_state_dict': ...}).
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax


def _to_flax(torch_arr: np.ndarray, leaf: str) -> np.ndarray:
    a = np.asarray(torch_arr)
    if leaf == "kernel":
        if a.ndim == 4:     # conv2d [O,I,kh,kw] -> [kh,kw,I,O]
            return a.transpose(2, 3, 1, 0)
        if a.ndim == 5:     # conv3d [O,I,kd,kh,kw] -> [kd,kh,kw,I,O]
            return a.transpose(2, 3, 4, 1, 0)
        if a.ndim == 2:     # linear [O,I] -> [I,O]
            return a.T
    return a


def torch_key(path) -> str:
    names = [p.key if hasattr(p, "key") else str(p) for p in path]
    leaf = names[-1]
    if leaf == "kernel" or leaf == "scale":
        return ".".join(names[:-1] + ["weight"])
    if leaf == "bias":
        return ".".join(names)
    return ".".join(names)  # custom params keep their own name


def convert_state_dict(flax_params, state_dict: Dict[str, np.ndarray],
                       prefix: str = "", strict: bool = True):
    """Fill `flax_params` (an initialised pytree) from a torch state dict.

    prefix: optional torch-side prefix to strip/prepend (e.g. "nr_net.").
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    used = set()

    def fill(path, leaf_val):
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        key = prefix + torch_key(path)
        if key not in sd:
            if strict:
                raise KeyError(f"missing torch key {key} for flax path "
                               f"{'/'.join(names)}")
            return leaf_val
        used.add(key)
        arr = _to_flax(sd[key], names[-1])
        if arr.shape != leaf_val.shape:
            raise ValueError(f"{key}: torch {arr.shape} vs flax {leaf_val.shape}")
        return arr.astype(np.asarray(leaf_val).dtype)

    out = jax.tree_util.tree_map_with_path(fill, flax_params)
    return out, sorted(set(sd) - used)
