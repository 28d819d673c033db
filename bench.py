"""Benchmark: TSDF-query + ray throughput of the flagship inference path.

Workload = the reference planner's core() (ref src/nr/main.py:211-253): 6
source views at 288x512 → CNN encoders → 40^3 SDF volume query (64k points x 6
views through the epipolar aggregator) → 3D-CNN grasp head. This is the
latency-critical closed-loop-grasping path and exercises every hot kernel.

Baseline: the reference paper's real-time claim for the PyTorch pipeline on a
desktop GPU is ~10 volume inferences/s (64k TSDF queries each) — we use
640k TSDF-queries/s as the reference baseline. vs_baseline = ours / baseline.

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
    ds = SyntheticSceneDataset(h=h, w=w, n_rays=512, seed=0, fuse_views=6)
    batch = jax.tree_util.tree_map(jnp.asarray, ds.sample())
    data = batch["data"]

    # inference config: volume + grasp head only (render_rgb off, like the
    # planner — ref main.py:150)
    model = GraspNeRF(renderer_cfg={"render_rgb": False,
                                    "use_depth_loss": False})
    init_data = dict(data)
    params = model.init(jax.random.PRNGKey(0), init_data,
                        train=False)["params"]

    @jax.jit
    def infer(params, data):
        return model.apply({"params": params}, data, train=False)

    out = infer(params, data)
    jax.block_until_ready(out)

    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = infer(params, data)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter

    res = 40
    tsdf_queries = res ** 3
    qps = tsdf_queries / dt
    print(json.dumps({
        "metric": "tsdf_queries_per_s",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / REF_BASELINE_TSDF_QPS, 3),
    }))


if __name__ == "__main__":
    main()
