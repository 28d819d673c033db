"""2D CNN building blocks (flax.linen, channels-last / NHWC — TPU-native layout).

Re-designs the reference's encoder stack (ref: src/nr/network/ops.py:5-230,
init_net.py:8-38, vis_encoder.py:6-24) as functional flax modules. Parity rules
preserved exactly (verified by tests/test_models.py with converted weights):
  - reflect padding on every 3x3/7x7 conv, zero bias unless the reference layer
    has one
  - InstanceNorm (per-sample, per-channel over H,W; no running stats; affine)
  - ELU conv blocks in the decoder, ReLU ResNet blocks in the encoder
  - bilinear x2 upsampling with align_corners=True

Submodule names mirror the reference's state-dict keys (e.g. "layer1.0.conv1")
so a PyTorch checkpoint converts mechanically (models/convert.py).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.interpolate import resize_bilinear_align_corners


class TorchConv(nn.Module):
    """Conv2d with torch-style explicit padding; NHWC.

    pad_mode 'reflect' reproduces padding_mode='reflect'; 'zeros' the default.
    Owns its 'kernel'/'bias' params directly so the flax param path equals the
    reference's state-dict key (models/convert.py relies on this).
    """
    features: int
    kernel: int
    stride: int = 1
    padding: int | None = None  # default: (kernel-1)//2
    use_bias: bool = True
    pad_mode: str = "reflect"
    dtype: Any = jnp.float32  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2 if self.padding is None else self.padding
        x = x.astype(self.dtype)
        if p > 0:
            mode = "reflect" if self.pad_mode == "reflect" else "constant"
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=mode)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features))
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (self.stride, self.stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,)).astype(self.dtype)
        return y


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True, track_running_stats=False): normalize each
    (sample, channel) over spatial dims. x [..., H, W, C]. Statistics are
    computed in float32 regardless of the compute dtype."""
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
        var = jnp.var(xf, axis=(-3, -2), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return y * scale.astype(self.dtype) + bias.astype(self.dtype)


def _conv3x3(features, stride=1, name=None, dtype=jnp.float32):
    return TorchConv(features, 3, stride, use_bias=False, name=name,
                     dtype=dtype)


def _conv1x1(features, stride=1, use_bias=False, name=None,
             dtype=jnp.float32):
    return TorchConv(features, 1, stride, use_bias=use_bias, name=name,
                     dtype=dtype)


class BasicBlock(nn.Module):
    """ResNet BasicBlock with InstanceNorm (ref: ops.py:86-123)."""
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x.astype(self.dtype)
        d = self.dtype
        out = _conv3x3(self.planes, self.stride, name="conv1", dtype=d)(x)
        out = InstanceNorm(name="bn1", dtype=d)(out)
        out = nn.relu(out)
        out = _conv3x3(self.planes, 1, name="conv2", dtype=d)(out)
        out = InstanceNorm(name="bn2", dtype=d)(out)
        if self.has_downsample:
            identity = _conv1x1(self.planes, self.stride, name="downsample.0",
                                dtype=d)(x)
            identity = InstanceNorm(name="downsample.1", dtype=d)(identity)
        return nn.relu(out + identity)


class ResidualBlock(nn.Module):
    """Pre-norm residual block (ref: ops.py:43-76); dims equal → no shortcut."""
    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        h = InstanceNorm(name="conv.0", dtype=d)(x)
        h = nn.relu(h)
        h = _conv3x3(self.dim_out, name="conv.2", dtype=d)(h)
        h = InstanceNorm(name="conv.3", dtype=d)(h)
        h = nn.relu(h)
        h = _conv3x3(self.dim_out, name="conv.5", dtype=d)(h)
        if x.shape[-1] != self.dim_out:
            x = TorchConv(self.dim_out, 1, use_bias=True, name="short_cut",
                          dtype=d)(x)
        return x.astype(d) + h


class ConvINElu(nn.Module):
    """conv + InstanceNorm + ELU (ref: ops.py:125-138)."""
    features: int
    kernel: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = TorchConv(self.features, self.kernel, self.stride, name="conv",
                      dtype=self.dtype)(x)
        x = InstanceNorm(name="bn", dtype=self.dtype)(x)
        return nn.elu(x)


class UpConv(nn.Module):
    """x2 bilinear (align_corners) upsample + ConvINElu (ref: ops.py:140-148)."""
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        x = resize_bilinear_align_corners(x, 2 * h, 2 * w).astype(self.dtype)
        return ConvINElu(self.features, self.kernel, name="conv",
                         dtype=self.dtype)(x)


class ResUNetLight(nn.Module):
    """2D ResUNet image encoder (ref: ops.py:150-230).

    Input [B,H,W,in_dim] with H,W % 8 == 0 → features [B,H/4,W/4,out_dim]
    (conv1 stride 2, layer1 stride 2, decoder upsamples twice from H/16).
    """
    layers: Sequence[int] = (2, 3, 6, 3)
    out_dim: int = 32
    inplanes: int = 32
    dtype: Any = jnp.float32

    def _stage(self, x, planes, blocks, stride, name):
        x = BasicBlock(planes, stride, has_downsample=True, name=f"{name}.0",
                       dtype=self.dtype)(x)
        for i in range(1, blocks):
            x = BasicBlock(planes, 1, name=f"{name}.{i}", dtype=self.dtype)(x)
        return x

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = TorchConv(self.inplanes, 7, 2, padding=3, use_bias=False,
                      name="conv1", dtype=d)(x)
        x = InstanceNorm(name="bn1", dtype=d)(x)
        x = nn.relu(x)
        x1 = self._stage(x, 32, self.layers[0], 2, "layer1")
        x2 = self._stage(x1, 64, self.layers[1], 2, "layer2")
        x3 = self._stage(x2, 128, self.layers[2], 2, "layer3")

        # skipconnect concatenates [upsampled, encoder skip] in that order
        # (ref ops.py:205-212: cat([x2, x1]) with x1 = the skip argument)
        y = UpConv(64, 3, name="upconv3", dtype=d)(x3)
        y = jnp.concatenate([y, x2], -1)
        y = ConvINElu(64, 3, name="iconv3", dtype=d)(y)
        y = UpConv(32, 3, name="upconv2", dtype=d)(y)
        y = jnp.concatenate([y, x1], -1)
        y = ConvINElu(32, 3, name="iconv2", dtype=d)(y)
        return TorchConv(self.out_dim, 1, use_bias=True, pad_mode="zeros",
                         name="out_conv", dtype=d)(y)


class RayFeatInitNet(nn.Module):
    """Per-view ray-feature extractor (ref: init_net.py:8-38 'cost_volume' —
    despite its name the shipped release builds no cost volume: a second
    ResUNet + conv head on the reference images)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, imgs):
        d = self.dtype
        feats = ResUNetLight((2, 3, 6, 3), 32, 32, name="res_net",
                             dtype=d)(imgs)
        h = _conv3x3(32, name="out_conv.0", dtype=d)(feats)
        h = ResidualBlock(32, name="out_conv.1", dtype=d)(h)
        return _conv1x1(32, name="out_conv.2", dtype=d)(h)


class VisEncoder(nn.Module):
    """Refine ray feats with image feats (ref: vis_encoder.py:6-24).
    Input order: concat(img_feats, ray_feats)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ray_feats, img_feats):
        d = self.dtype
        x = jnp.concatenate([img_feats, ray_feats], -1)
        x = _conv3x3(32, name="out_conv.0", dtype=d)(x)
        x = ResidualBlock(32, name="out_conv.1", dtype=d)(x)
        x = ResidualBlock(32, name="out_conv.2", dtype=d)(x)
        return _conv1x1(32, name="out_conv.3", dtype=d)(x)
