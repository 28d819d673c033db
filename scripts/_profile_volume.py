"""Dev profiling: honest slope-timed stage breakdown of the volume path.

Methodology: see bench.py docstring — on the axon backend, block_until_ready
lies until the first D2H, and every call after a D2H pays a sync round trip.
Each stage is timed as (T(n2)-T(n1))/(n2-n1) with a forcing D2H per run.
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import numpy as np

from graspnerf_tpu.models import NeuralRayRenderer
from graspnerf_tpu.models.renderer import project_to_views
from graspnerf_tpu.ops.fused_gather import pack_feature_maps
from graspnerf_tpu.ops.tsdf import grid_points_device
from bench import build_ref, slope_time


def main():
    ref = build_ref()
    r = NeuralRayRenderer(render_rgb=False, use_depth_loss=False,
                          compute_dtype="bfloat16")
    v = r.init(jax.random.PRNGKey(0), {"ref": ref}, train=False)

    # stage 0: CNN encoders (+ packing)
    @jax.jit
    def enc_f(v, ref, fb):
        imgs = ref["imgs"] * (1 + 1e-9 * fb)
        imf, rayf = r.apply(v, {"imgs": imgs},
                            method=lambda m, rr: m.encode_views(rr))
        packed = pack_feature_maps(imgs, imf, rayf)
        return jnp.mean(packed)
    print("encoders+pack", round(slope_time(enc_f, v, ref) * 1e3, 2), "ms",
          flush=True)

    imf, rayf = jax.jit(lambda v, imgs: r.apply(
        v, {"imgs": imgs}, method=lambda m, rr: m.encode_views(rr)))(
            v, ref["imgs"])
    packed = jax.jit(pack_feature_maps)(ref["imgs"], imf, rayf)

    res = 40
    que_pts = jax.jit(lambda b: (grid_points_device(res, 0.3) + b)
                      .reshape(1, res * res, res, 3)[:, :, ::-1])(
                          ref["bbox3d_min"])

    # stage 1: projection + fused gather
    @jax.jit
    def prj_f(ref, imf, rayf, packed, que_pts, fb):
        prj = project_to_views(ref, que_pts * (1 + 1e-9 * fb), imf, rayf,
                               packed)
        return (jnp.mean(prj["ray_feats"]) + jnp.mean(prj["img_feats"])
                + jnp.mean(prj["rgb"]) + jnp.mean(prj["dir"]))
    print("project+fused-gather",
          round(slope_time(prj_f, ref, imf, rayf, packed, que_pts) * 1e3, 2),
          "ms", flush=True)

    prj = jax.jit(lambda ref, a, b, p, q: project_to_views(ref, q, a, b, p))(
        ref, imf, rayf, packed, que_pts)

    # stage 2: dist decoder + prob
    @jax.jit
    def dist_f(v, prj, ref, fb):
        p = dict(prj)
        p["ray_feats"] = prj["ray_feats"] * (1 + 1e-9 * fb)
        p2 = r.apply(v, p, ref["depth_range"], method=lambda m, pp, dr:
                     m._predict_ray_prob(m.dist_decoder, pp, dr, None))
        return jnp.mean(p2["hit_prob"])
    print("dist-decoder", round(slope_time(dist_f, v, prj, ref) * 1e3, 2),
          "ms", flush=True)

    prj2 = jax.jit(lambda v, prj, ref: r.apply(
        v, prj, ref["depth_range"], method=lambda m, pp, dr:
        m._predict_ray_prob(m.dist_decoder, pp, dr, None)))(v, prj, ref)

    # stage 3: aggregator (sdf only — grad path DCEs like in sample_volume)
    @jax.jit
    def agg_f(v, prj2, que_pts, fb):
        p = dict(prj2)
        p["ray_feats"] = prj2["ray_feats"] * (1 + 1e-9 * fb)
        que_dir = jnp.zeros_like(que_pts).at[..., 2].set(1.0)
        out = r.apply(v, p, que_dir, que_pts, method=lambda m, pp, qd, qp:
                      m.agg_net(pp, qd, qp, None))
        return jnp.mean(out["sdf"])
    print("aggregator", round(slope_time(agg_f, v, prj2, que_pts) * 1e3, 2),
          "ms", flush=True)

    # stage 4: full sample_volume via the model method
    @jax.jit
    def vol_f(v, ref, fb):
        rr = dict(ref)
        rr["imgs"] = ref["imgs"] * (1 + 1e-9 * fb)
        out = r.apply(v, {"ref": rr}, train=False)
        return jnp.mean(out["volume"])
    print("full volume fwd", round(slope_time(vol_f, v, ref) * 1e3, 2), "ms",
          flush=True)


if __name__ == "__main__":
    main()
