"""Benchmark: TSDF-query throughput of the flagship inference path.

Workload = the reference planner's core() (ref src/nr/main.py:211-253): 6
source views at 288x512 → CNN encoders → 40^3 SDF volume query (64k points x 6
views through the epipolar aggregator) → 3D-CNN grasp head. This is the
latency-critical closed-loop-grasping path and exercises every hot kernel.

Methodology: inputs live on-device; iterations are chained through a data
dependency (each step's images are perturbed by the previous volume's mean) so
the device cannot overlap or elide work, while keeping the host out of the
loop (the dev-tunnel round-trip is ~30 ms and would swamp the measurement).

Baseline: the reference paper's real-time claim for the PyTorch pipeline on a
desktop GPU is ~10 volume inferences/s → 640k TSDF-queries/s.
vs_baseline = ours / baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10.0)
import jax.numpy as jnp

REF_BASELINE_TSDF_QPS = 640_000.0  # ~10 Hz x 64k queries (PyTorch ref GPU)


def main():
    from graspnerf_tpu.models import GraspNeRF
    from graspnerf_tpu.data import SyntheticSceneDataset

    h, w = 288, 512
    ds = SyntheticSceneDataset(h=h, w=w, n_rays=64, seed=0, fuse_views=6)
    batch = ds.sample()
    ref = {k: jnp.asarray(v) for k, v in batch["data"]["ref"].items()}

    model = GraspNeRF(renderer_cfg={"render_rgb": False,
                                    "use_depth_loss": False,
                                    "compute_dtype": "bfloat16"})
    params = model.init(jax.random.PRNGKey(0), {"ref": ref},
                        train=False)["params"]

    @jax.jit
    def step(params, ref, feedback):
        r = dict(ref)
        r["imgs"] = ref["imgs"] * (1.0 + 1e-6 * feedback)
        out = model.apply({"params": params}, {"ref": r}, train=False)
        return jnp.mean(out["volume"])

    fb = jnp.float32(0.0)
    fb = step(params, ref, fb)          # compile + warmup
    fb.block_until_ready()
    for _ in range(3):
        fb = step(params, ref, fb)
    fb.block_until_ready()

    n_iter = 30
    t0 = time.perf_counter()
    for _ in range(n_iter):
        fb = step(params, ref, fb)      # serial chain via data dependency
    fb.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter

    res = 40
    qps = res ** 3 / dt
    print(json.dumps({
        "metric": "tsdf_queries_per_s",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / REF_BASELINE_TSDF_QPS, 3),
    }))


if __name__ == "__main__":
    main()
