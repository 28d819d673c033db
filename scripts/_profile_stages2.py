"""Dev profiling round 5: sub-encoder + render-path stage breakdown.

Complements _profile_volume.py: splits the 9.6 ms encoder stage into its three
CNNs + packing, times the VGN grasp head, and breaks the 107 ms render path
into sampling/gather/decoder/aggregator stages. Slope timing per bench.py.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import numpy as np

from graspnerf_tpu.models import NeuralRayRenderer
from graspnerf_tpu.models.grasp_head import VGNConvNet
from graspnerf_tpu.models.renderer import project_to_views
from graspnerf_tpu.ops.fused_gather import pack_feature_maps
from graspnerf_tpu.ops import geometry
from bench import build_ref, slope_time


def t(name, fn, *args):
    c = jax.jit(fn).lower(*args, jnp.float32(0.0)).compile()
    dt = slope_time(c, *args)
    print(f"{name:24s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    ref = build_ref()
    r = NeuralRayRenderer(render_rgb=True, use_depth_loss=False,
                          do_sample_volume=False, compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    coords = np.stack([rng.randint(0, 512, 4096), rng.randint(0, 288, 4096)],
                      -1).astype(np.float32)
    que = {"coords": jnp.asarray(coords[None]),
           "poses": ref["poses"][:1], "Ks": ref["Ks"][:1],
           "depth_range": ref["depth_range"][:1]}
    data = {"ref": ref, "que": que}
    v = r.init(jax.random.PRNGKey(0), data, train=False)

    # --- encoder split
    def enc1(v, imgs, fb):
        out = r.apply(v, imgs * (1 + 1e-9 * fb),
                      method=lambda m, im: m.image_encoder(im))
        return jnp.mean(out).astype(jnp.float32)
    t("image_encoder", enc1, v, ref["imgs"])

    def enc2(v, imgs, fb):
        out = r.apply(v, imgs * (1 + 1e-9 * fb),
                      method=lambda m, im: m.init_net(im))
        return jnp.mean(out).astype(jnp.float32)
    t("init_net", enc2, v, ref["imgs"])

    imf, rayf0 = jax.jit(lambda v, im: r.apply(
        v, {"imgs": im}, method=lambda m, rr: m.encode_views(rr)))(
            v, ref["imgs"])

    def enc3(v, imf, rayf, fb):
        out = r.apply(v, rayf * (1 + 1e-9 * fb), imf,
                      method=lambda m, rf, mf: m.vis_encoder(rf, mf))
        return jnp.mean(out).astype(jnp.float32)
    t("vis_encoder", enc3, v, imf, rayf0)

    def packf(imgs, imf, rayf, fb):
        return jnp.mean(pack_feature_maps(imgs * (1 + 1e-9 * fb), imf, rayf)).astype(jnp.float32)
    t("pack", packf, ref["imgs"], imf, rayf0)

    # --- grasp head on a 40^3 volume
    head = VGNConvNet(dtype=jnp.bfloat16)
    vol = jnp.asarray(rng.rand(1, 40, 40, 40, 1).astype(np.float32))
    hv = head.init(jax.random.PRNGKey(0), vol)

    def headf(hv, vol, fb):
        q, ro, w = head.apply(hv, vol * (1 + 1e-9 * fb))
        return (jnp.mean(q) + jnp.mean(ro) + jnp.mean(w)).astype(jnp.float32)
    t("vgn_head", headf, hv, vol)

    # --- render-path stages at 4096 rays x 40 samples
    packed = jax.jit(pack_feature_maps)(ref["imgs"], imf, rayf0)
    que_depth = jax.jit(lambda dr: geometry.sample_depth(dr, 4096, 40))(
        que["depth_range"])

    def geomf(que, que_depth, fb):
        qd = que_depth * (1 + 1e-9 * fb)
        que_pts, que_dir = geometry.depth2points(
            que["coords"], que["poses"], que["Ks"], qd)
        return (jnp.mean(que_pts) + jnp.mean(que_dir)).astype(jnp.float32)
    t("depth2points", geomf, que, que_depth)

    que_pts, que_dir = jax.jit(geometry.depth2points)(
        que["coords"], que["poses"], que["Ks"], que_depth)

    def prjf(ref, imf, rayf, packed, que_pts, fb):
        prj = project_to_views(ref, que_pts * (1 + 1e-9 * fb), imf, rayf,
                               packed)
        return sum(jnp.mean(x.astype(jnp.float32)) for x in prj.values())
    t("project+gather@4096x40", prjf, ref, imf, rayf0, packed, que_pts)

    prj = jax.jit(lambda ref, a, b, p, q: project_to_views(ref, q, a, b, p))(
        ref, imf, rayf0, packed, que_pts)

    def distf(v, prj, ref, que_depth, fb):
        p = dict(prj)
        p["ray_feats"] = prj["ray_feats"] * (1 + 1e-9 * fb)
        di = geometry.depth2inv_dists(que_depth, que["depth_range"])
        p2 = r.apply(v, p, ref["depth_range"], di,
                     method=lambda m, pp, dr, dd:
                     m._predict_ray_prob(m.dist_decoder, pp, dr, dd))
        return jnp.mean(p2["hit_prob"]).astype(jnp.float32)
    t("dist_decoder@4096x40", distf, v, prj, ref, que_depth)

    prj2 = jax.jit(lambda v, prj, ref, qd: r.apply(
        v, prj, ref["depth_range"], geometry.depth2inv_dists(
            qd, que["depth_range"]),
        method=lambda m, pp, dr, dd:
        m._predict_ray_prob(m.dist_decoder, pp, dr, dd)))(
            v, prj, ref, que_depth)

    def aggf(v, prj2, que_pts, que_dir, que_depth, fb):
        p = dict(prj2)
        p["ray_feats"] = prj2["ray_feats"] * (1 + 1e-9 * fb)
        qdists = geometry.depth2dists(que_depth)
        out = r.apply(v, p, que_dir, que_pts, qdists,
                      method=lambda m, pp, qd, qp, qq:
                      m.agg_net(pp, qd, qp, qq))
        return (jnp.mean(out["sdf"]) + jnp.mean(out["alpha"])).astype(jnp.float32)
    t("aggregator@4096x40", aggf, v, prj2, que_pts, que_dir, que_depth)

    # full render fwd for cross-check
    def renf(v, data, fb):
        d = dict(data)
        rr = dict(d["ref"])
        rr["imgs"] = rr["imgs"] * (1 + 1e-9 * fb)
        d["ref"] = rr
        out = r.apply(v, d, train=False)
        return (jnp.mean(out["pixel_colors_nr_fine"])
                + jnp.mean(out["render_depth_fine"])).astype(jnp.float32)
    t("full render fwd", renf, v, data)


if __name__ == "__main__":
    main()
