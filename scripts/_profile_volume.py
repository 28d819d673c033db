"""Dev profiling: stage timings inside the volume query (chained, on-TPU).

All tensors are passed as jit ARGUMENTS — closure/np constants embedded in
the graph are re-materialized per call on the axon remote backend (~20 ms/MB)
and would swamp the numbers (see bench.py / ops/tsdf.py grid_points_device).
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10.0)
import jax.numpy as jnp

from graspnerf_tpu.models import NeuralRayRenderer
from graspnerf_tpu.models.renderer import project_to_views
from graspnerf_tpu.data import SyntheticSceneDataset
from graspnerf_tpu.ops.tsdf import grid_points_device


def chain_time(f, *args, n=30):
    fb = jnp.float32(0.0)
    g = jax.jit(f)
    fb = g(*args, fb)
    jax.block_until_ready(fb)
    for _ in range(3):
        fb = g(*args, fb)
    jax.block_until_ready(fb)
    t0 = time.perf_counter()
    for _ in range(n):
        fb = g(*args, fb)
    jax.block_until_ready(fb)
    return (time.perf_counter() - t0) / n * 1000


def main():
    ds = SyntheticSceneDataset(h=288, w=512, n_rays=64, seed=0, fuse_views=6)
    batch = ds.sample()
    ref = {k: jnp.asarray(v) for k, v in batch["data"]["ref"].items()}
    r = NeuralRayRenderer(render_rgb=False, use_depth_loss=False,
                          compute_dtype="bfloat16")
    v = r.init(jax.random.PRNGKey(0), {"ref": ref}, train=False)

    # stage 0: CNN encoders
    def enc_f(v, ref, fb):
        imgs = ref["imgs"] * (1 + 1e-9 * fb)
        imf, rayf = r.apply(v, {"imgs": imgs},
                            method=lambda m, rr: m.encode_views(rr))
        return jnp.mean(imf) + jnp.mean(rayf)
    print("encoders", round(chain_time(enc_f, v, ref), 2), "ms", flush=True)

    imf, rayf = jax.jit(lambda v, imgs: r.apply(
        v, {"imgs": imgs}, method=lambda m, rr: m.encode_views(rr)))(
            v, ref["imgs"])
    jax.block_until_ready((imf, rayf))

    res = 40
    que_pts = jax.jit(lambda b: (grid_points_device(res, 0.3) + b)
                      .reshape(1, res * res, res, 3)[:, :, ::-1])(
                          ref["bbox3d_min"])

    # stage 1: projection + gathers
    def prj_f(ref, imf, rayf, que_pts, fb):
        prj = project_to_views(ref, que_pts * (1 + 1e-9 * fb), imf, rayf)
        return (jnp.mean(prj["ray_feats"]) + jnp.mean(prj["img_feats"])
                + jnp.mean(prj["rgb"]) + jnp.mean(prj["dir"]))
    print("project+gather", round(chain_time(prj_f, ref, imf, rayf, que_pts),
                                  2), "ms", flush=True)

    prj = jax.jit(lambda ref, a, b, q: project_to_views(ref, q, a, b))(
        ref, imf, rayf, que_pts)
    jax.block_until_ready(prj)

    # stage 2: dist decoder + prob
    def dist_f(v, prj, ref, fb):
        p = dict(prj)
        p["ray_feats"] = prj["ray_feats"] * (1 + 1e-9 * fb)
        p2 = r.apply(v, p, ref["depth_range"], method=lambda m, pp, dr:
                     m._predict_ray_prob(m.dist_decoder, pp, dr, None))
        return jnp.mean(p2["hit_prob"])
    print("dist-decoder", round(chain_time(dist_f, v, prj, ref), 2), "ms",
          flush=True)

    prj2 = jax.jit(lambda v, prj, ref: r.apply(
        v, prj, ref["depth_range"], method=lambda m, pp, dr:
        m._predict_ray_prob(m.dist_decoder, pp, dr, None)))(v, prj, ref)
    jax.block_until_ready(prj2)

    # stage 3: aggregator (sdf only — grad path DCEs like in sample_volume)
    def agg_f(v, prj2, que_pts, fb):
        p = dict(prj2)
        p["ray_feats"] = prj2["ray_feats"] * (1 + 1e-9 * fb)
        que_dir = jnp.zeros_like(que_pts).at[..., 2].set(1.0)
        out = r.apply(v, p, que_dir, que_pts, method=lambda m, pp, qd, qp:
                      m.agg_net(pp, qd, qp, None))
        return jnp.mean(out["sdf"])
    print("aggregator", round(chain_time(agg_f, v, prj2, que_pts), 2), "ms",
          flush=True)

    # stage 4: full sample_volume via the model method
    def vol_f(v, ref, fb):
        rr = dict(ref)
        rr["imgs"] = ref["imgs"] * (1 + 1e-9 * fb)
        out = r.apply(v, {"ref": rr}, train=False)
        return jnp.mean(out["volume"])
    print("full volume fwd", round(chain_time(vol_f, v, ref), 2), "ms",
          flush=True)


if __name__ == "__main__":
    main()
