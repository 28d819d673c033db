"""VGN-style 3D-CNN grasp head (ref: src/gd/networks.py:39-97).

Consumes the predicted 40^3 TSDF volume (channels-last [B,40,40,40,1]) and
predicts per-voxel grasp quality (sigmoid), rotation (L2-normalized quaternion,
xyzw) and opening width. Conv3d padding/stride semantics match torch exactly
(padding k//2, stride-2 encoder); decoder upsampling is nearest to 10/20/40.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.interpolate import resize_nearest_3d


class TorchConv3D(nn.Module):
    """Conv3d(k, stride, padding=k//2) lowered as k z-shifted 2D convs.

    XLA:TPU's native Conv3D lowering runs these tiny volumes at ~0.7 TFLOP/s
    (3.8 ms for the whole head); folding depth into the batch axis and
    summing k well-tuned 2D convs runs the identical math in 1.4 ms
    (scripts/_bench_head.py measurement on the v5e chip). Param layout is
    exactly flax nn.Conv's (kernel [k,k,k,Cin,O], bias [O]) so the PyTorch
    checkpoint converter is unaffected.
    """
    features: int
    kernel: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel, self.stride
        p = k // 2
        d = self.dtype
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (k, k, k, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(d)
        kern = kern.astype(d)
        B, D, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0), (0, 0)))
        Do = (D + 2 * p - k) // s + 1
        out = None
        for dz in range(k):
            sl = jax.lax.slice_in_dim(xp, dz, dz + (Do - 1) * s + 1, s, 1)
            y = jax.lax.conv_general_dilated(
                sl.reshape(B * Do, H, W, C), kern[dz], (s, s),
                [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=d)
            out = y if out is None else out + y
        Ho, Wo = out.shape[1], out.shape[2]
        return (out.reshape(B, Do, Ho, Wo, self.features)
                + bias.astype(d))


def _conv3d(features, kernel, stride=1, name=None, dtype=jnp.float32):
    return TorchConv3D(features, kernel, stride, name=name, dtype=dtype)


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
