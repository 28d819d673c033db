"""VGN-style 3D-CNN grasp head (ref: src/gd/networks.py:39-97).

Consumes the predicted 40^3 TSDF volume (channels-last [B,40,40,40,1]) and
predicts per-voxel grasp quality (sigmoid), rotation (L2-normalized quaternion,
xyzw) and opening width. Conv3d padding/stride semantics match torch exactly
(padding k//2, stride-2 encoder); decoder upsampling is nearest to 10/20/40.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..ops.interpolate import resize_nearest_3d


def _conv3d(features, kernel, stride=1, name=None, dtype=jnp.float32):
    p = kernel // 2
    return nn.Conv(features, (kernel,) * 3, strides=(stride,) * 3,
                   padding=[(p, p)] * 3, name=name, dtype=dtype)


class VGNConvNet(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vol):
        res = vol.shape[1]  # 40 in the reference; decoder targets res/4,res/2,res
        x = nn.relu(_conv3d(16, 5, 2, name="encoder.conv1", dtype=self.dtype)(vol))
        x = nn.relu(_conv3d(32, 3, 2, name="encoder.conv2", dtype=self.dtype)(x))
        x = nn.relu(_conv3d(64, 3, 2, name="encoder.conv3", dtype=self.dtype)(x))

        x = nn.relu(_conv3d(64, 3, name="decoder.conv1", dtype=self.dtype)(x))
        x = resize_nearest_3d(x, res // 4, res // 4, res // 4)
        x = nn.relu(_conv3d(32, 3, name="decoder.conv2", dtype=self.dtype)(x))
        x = resize_nearest_3d(x, res // 2, res // 2, res // 2)
        x = nn.relu(_conv3d(16, 5, name="decoder.conv3", dtype=self.dtype)(x))
        x = resize_nearest_3d(x, res, res, res)

        qual = nn.sigmoid(_conv3d(1, 5, name="conv_qual",
                                  dtype=self.dtype)(x).astype(jnp.float32))
        rot = _conv3d(4, 5, name="conv_rot", dtype=self.dtype)(x)
        rot = rot.astype(jnp.float32)
        rot = rot / jnp.clip(
            jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
        width = _conv3d(1, 5, name="conv_width",
                        dtype=self.dtype)(x).astype(jnp.float32)
        return qual, rot, width
