"""Dev micro-bench: VGN 3D-CNN grasp-head lowering strategies on TPU.

The round-5 stage profile shows the head at 3.77 ms for ~2.5 GFLOP
(~0.7 TFLOP/s): XLA's native Conv3D lowering wastes the MXU at these tiny
spatial extents. Variants:

  conv3d      current flax nn.Conv 3D path
  zbatch      every Conv3D decomposed into k 2D convs over z-shifted slabs
              (depth folded into the batch axis — TPU's well-tuned 2D path)
  zbatch1     zbatch + the three output heads merged into ONE 6-channel conv
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from graspnerf_tpu.models.grasp_head import VGNConvNet
from graspnerf_tpu.ops.interpolate import resize_nearest_3d
from bench import slope_time


def conv3d_zbatch(x, kernel, bias, stride=1):
    """Conv3D via k z-shifted 2D convs: x [B,D,H,W,C], kernel [k,k,k,C,O]."""
    k = kernel.shape[0]
    p = k // 2
    B, D, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0), (0, 0)))
    Do = (D + stride - 1) // stride
    out = None
    for dz in range(k):
        sl = xp[:, dz:dz + D:stride]  # [B,Do,H,W,C]
        y = jax.lax.conv_general_dilated(
            sl.reshape(B * Do, H, W, C), kernel[dz],
            (stride, stride), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=sl.dtype)
        out = y if out is None else out + y
    Ho, Wo = out.shape[1], out.shape[2]
    return out.reshape(B, Do, Ho, Wo, -1) + bias


class VGNZBatch(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16
    merge_heads: bool = False

    @nn.compact
    def __call__(self, vol):
        res = vol.shape[1]
        d = self.dtype

        def c3(x, feats, k, stride=1, name=None):
            kern = self.param(name + "/kernel", nn.initializers.lecun_normal(),
                              (k, k, k, x.shape[-1], feats))
            b = self.param(name + "/bias", nn.initializers.zeros, (feats,))
            return conv3d_zbatch(x.astype(d), kern.astype(d), b.astype(d),
                                 stride)

        x = nn.relu(c3(vol, 16, 5, 2, "e1"))
        x = nn.relu(c3(x, 32, 3, 2, "e2"))
        x = nn.relu(c3(x, 64, 3, 2, "e3"))
        x = nn.relu(c3(x, 64, 3, 1, "d1"))
        x = resize_nearest_3d(x, res // 4, res // 4, res // 4)
        x = nn.relu(c3(x, 32, 3, 1, "d2"))
        x = resize_nearest_3d(x, res // 2, res // 2, res // 2)
        x = nn.relu(c3(x, 16, 5, 1, "d3"))
        x = resize_nearest_3d(x, res, res, res)
        if self.merge_heads:
            h = c3(x, 6, 5, 1, "heads").astype(jnp.float32)
            qual = nn.sigmoid(h[..., :1])
            rot = h[..., 1:5]
            rot = rot / jnp.clip(jnp.linalg.norm(rot, axis=-1, keepdims=True),
                                 1e-12)
            return qual, rot, h[..., 5:]
        qual = nn.sigmoid(c3(x, 1, 5, 1, "q").astype(jnp.float32))
        rot = c3(x, 4, 5, 1, "r").astype(jnp.float32)
        rot = rot / jnp.clip(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
        width = c3(x, 1, 5, 1, "w").astype(jnp.float32)
        return qual, rot, width


def main():
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(1, 40, 40, 40, 1).astype(np.float32))

    def t(name, model):
        v = model.init(jax.random.PRNGKey(0), vol)

        def f(v, vol, fb):
            q, r, w = model.apply(v, vol * (1 + 1e-9 * fb))
            return (jnp.mean(q) + jnp.mean(r) + jnp.mean(w)).astype(
                jnp.float32)
        c = jax.jit(f).lower(v, vol, jnp.float32(0.0)).compile()
        print(f"{name:10s} {slope_time(c, v, vol)*1e3:7.2f} ms", flush=True)

    t("conv3d", VGNConvNet(dtype=jnp.bfloat16))
    t("zbatch", VGNZBatch())
    t("zbatch1", VGNZBatch(merge_heads=True))


if __name__ == "__main__":
    main()
