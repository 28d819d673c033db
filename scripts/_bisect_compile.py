"""Dev tool: bisect the XLA:TPU compile blowup on the oracle (no-Pallas) path.

Round-4 finding (bench.py docstring): with use_pallas=False the volume/render
graphs did not finish COMPILING within 40 minutes, while the same graphs with
the Pallas view-fuse kernel compile in ~25-45 s. This script compiles the
volume step under several graph variants, each in a fresh subprocess with a
hard timeout, to find the offending subgraph.

Usage:  python scripts/_bisect_compile.py            # run all variants
        python scripts/_bisect_compile.py VARIANT    # one variant, in-proc

Variants:
  pallas        use_pallas=True (the known-fast baseline)
  oracle        use_pallas=False, full graph
  nograd        oracle with the inner vjp(∇sdf) stubbed to zeros
  barrier       oracle with an optimization_barrier after the fused gather
  threegather   oracle with the three-gather path (packed=None)
  noattn        oracle with ray_attention replaced by identity
  remat         oracle with jax.checkpoint around the view-fuse section
"""
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

VARIANTS = ["pallas", "oracle", "nograd", "barrier", "threegather", "noattn",
            "remat"]
TIMEOUT_S = int(os.environ.get("BISECT_TIMEOUT", "600"))


def run_variant(name: str):
    import jax  # fresh process: no persistent cache → honest compile time
    import jax.numpy as jnp
    import flax.linen as nn

    import graspnerf_tpu.models.ibrnet as ibr
    import graspnerf_tpu.models.renderer as rend
    from bench import build_ref
    # bench import enables the persistent compile cache — defeat it so every
    # variant pays (and reports) the true cold compile
    jax.config.update("jax_compilation_cache_dir", None)

    use_pallas = name == "pallas"

    if name == "nograd":
        # rebuild IBRNetNeus.__call__ with the inner vjp removed entirely
        def call_novjp(self, rgb_feat, neuray_feat, ray_diff, mask, que_pts,
                       rd):
            R, D = rd
            rgb_feat = rgb_feat.astype(self.dtype)
            neuray_feat = neuray_feat.astype(self.dtype)
            ray_diff = ray_diff.astype(self.dtype)
            mask = mask.astype(self.dtype)
            rgb_in = rgb_feat[..., :3]
            feat_const, num_valid, x, vis = self._view_fuse_modules(
                rgb_feat, neuray_feat, ray_diff, mask)
            feat_const = feat_const.reshape(R, D, -1)
            num_valid = num_valid.reshape(R, D, 1)
            pos_enc = jnp.asarray(
                ibr.positional_table(D)).astype(self.dtype)
            sdf = self._geometry(feat_const, que_pts, num_valid, pos_enc)
            h = jnp.concatenate([x, vis, ray_diff], -1)
            h = self.rgb_fc(h)
            h = jnp.where(mask == 0, -1e9, h)
            blend = jax.nn.softmax(h.astype(jnp.float32), 0)
            rgb_out = jnp.sum(rgb_in.astype(jnp.float32) * blend, 0)
            return (rgb_out.reshape(R, D, 3), sdf,
                    jnp.zeros(que_pts.shape, jnp.float32))

        ibr.IBRNetNeus.__call__ = call_novjp

    if name == "barrier":
        orig_gather = rend.fused_epipolar_gather

        def gather_barrier(packed, xy, valid, h, w):
            out = orig_gather(packed, xy, valid, h, w)
            return jax.lax.optimization_barrier(out)

        rend.fused_epipolar_gather = gather_barrier

    if name == "noattn":
        def attn_identity(self, q, k, v, mask=None):
            return q

        ibr.MultiHeadAttention.__call__ = attn_identity

    if name == "threegather":
        orig_ptv = rend.project_to_views

        def ptv_nopacked(ref, que_pts, img_feats, ray_feats, packed=None):
            return orig_ptv(ref, que_pts, img_feats, ray_feats, None)

        rend.project_to_views = ptv_nopacked

    if name == "remat":
        orig_vfm = ibr.IBRNetNeus._view_fuse_modules

        def vfm_remat(self, rgb_feat, neuray_feat, ray_diff, mask):
            return nn.remat(orig_vfm)(self, rgb_feat, neuray_feat, ray_diff,
                                      mask)

        ibr.IBRNetNeus._view_fuse_modules = vfm_remat

    from graspnerf_tpu.models import GraspNeRF
    ref = build_ref()
    model = GraspNeRF(renderer_cfg={"render_rgb": False,
                                    "use_depth_loss": False,
                                    "compute_dtype": "bfloat16",
                                    "use_pallas": use_pallas})
    params = model.init(jax.random.PRNGKey(0), {"ref": ref},
                        train=False)["params"]

    def step(params, ref):
        out = model.apply({"params": params}, {"ref": ref}, train=False)
        return jnp.mean(out["volume"])

    t0 = time.perf_counter()
    lowered = jax.jit(step).lower(params, ref)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"RESULT {name}: lower {t_lower:.1f}s compile {t_compile:.1f}s",
          flush=True)


def main():
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
        return
    for v in VARIANTS:
        t0 = time.perf_counter()
        try:
            out = subprocess.run(
                [sys.executable, __file__, v], capture_output=True, text=True,
                timeout=TIMEOUT_S,
                env={**os.environ, "JAX_COMPILATION_CACHE_DIR": ""})
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("RESULT")]
            print(line[0] if line else
                  f"RESULT {v}: rc {out.returncode} "
                  f"{out.stderr.strip().splitlines()[-1][:200] if out.stderr.strip() else ''}",
                  flush=True)
        except subprocess.TimeoutExpired:
            print(f"RESULT {v}: TIMEOUT >{TIMEOUT_S}s "
                  f"(wall {time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
