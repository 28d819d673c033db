"""Benchmark: the two flagship inference paths on one TPU chip.

1. Volume path (headline) — the reference planner's core() workload
   (ref src/nr/main.py:211-253): 6 source views at 288x512 → CNN encoders →
   40^3 SDF volume query (64k points x 6 views through the epipolar
   aggregator) → 3D-CNN grasp head. This is the latency-critical closed-loop
   grasping path.
2. Render path — the training/novel-view stack (ref renderer.py:201-220):
   6 source views at 288x512, one 4096-ray batch, 40 coarse + 40 fine
   samples/ray, full color + depth compositing. Reported as rays/s.

Methodology (slope timing — required for honesty on this backend):
the axon remote-execution backend has two quirks (measured round 3):
(a) before the first device→host transfer, block_until_ready() does NOT
    actually block, so naive chained timings read 100-1000x too fast;
(b) after any D2H, every dispatch pays a fixed synchronous round-trip.
So each measurement chains N calls through a data dependency (each step's
images perturbed by the previous scalar result), forces real completion with
one D2H, and reports (T(n2) - T(n1)) / (n2 - n1). Inputs are built in pure
numpy (no device round-trips) and live on-device as call ARGUMENTS (closure
constants re-materialize per call on this backend).

MFU: XLA's own cost analysis (compiled.cost_analysis()['flops']) divided by
wall time and the v5e-lite peak (197 TFLOP/s bf16). These are XLA's logical
FLOPs, not hardware counters; the paths are gather/VPU-heavy so low MFU is
expected. (The r02 'hbm_frac' fields were dropped: cost_analysis
'bytes accessed' counts logical bytes and produced >1.0 nonsense.)

Baselines: the reference repo publishes NO numbers (BASELINE.md), and no A100
measurement of the PyTorch reference exists in this environment — the volume
anchor is the paper's "real-time" claim read as ~10 volume inferences/s on a
desktop GPU → 640k TSDF-queries/s (same anchor as rounds 1-2 so vs_baseline
stays comparable). BASELINE.json's ">=5x rays/s/chip vs A100 PyTorch" target
is reported as absolute rays/s + step time for roofline checking.

Pallas vs oracle (re-measured round 5 on this chip): the round-4 "compile
blowup" on the oracle path does NOT reproduce — a 7-variant bisect
(scripts/_bisect_compile.py) compiled every oracle variant in 18-27 s, and a
BENCH_PALLAS=0 run completes end-to-end (volume 23.9 ms / render 107.5 ms vs
the kernel path's 29.2/156.9). The r4 stall was evidently the un-jitted
model.init + input staging over the axon tunnel being misattributed to
compilation. The oracle is therefore the flagship configuration; the Pallas
view-fuse kernel remains opt-in (BENCH_PALLAS=1) until it beats XLA on its
region (r4 measurement: kernel 3.7 ms vs XLA 1.2 ms for the 40^3 workload).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
import json
import time

import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import numpy as np

REF_BASELINE_TSDF_QPS = 640_000.0  # ~10 Hz x 64k queries (PyTorch ref GPU)
PEAK_BF16_FLOPS = 197e12           # TPU v5e-lite, one chip
N1, N2 = 3, 33


def slope_time(step, *args):
    """Median-free honest timing: chain calls, force with one D2H, diff two
    chain lengths. Returns seconds/call."""
    fb = jnp.float32(0.0)
    fb = step(*args, fb)
    _ = float(np.asarray(fb))  # compile + force (enters degraded-sync mode)

    def run(n):
        fb = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            fb = step(*args, fb)
        _ = float(np.asarray(fb))
        return time.perf_counter() - t0

    t1 = run(N1)
    t2 = run(N2)
    return (t2 - t1) / (N2 - N1)


def _compile(step, *args):
    """Explicitly lower+compile, returning (executable, compile_seconds,
    flops). The executable is reused for timing so compile cost is reported
    separately (round-3 lesson: cold XLA compiles of these graphs are the
    long pole and must be visible, not folded into a 'first call')."""
    t0 = time.perf_counter()
    c = jax.jit(step).lower(*args, jnp.float32(0.0)).compile()
    dt = time.perf_counter() - t0
    flops = 0.0
    try:
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        pass
    return c, dt, flops


def _probe_cache_key():
    """Probe result cache key: kernel source hash + backend. The probe costs
    ~6 min of driver budget (r4: 356 s, mostly un-jitted init dispatches over
    the tunnel); the result only changes when the kernel source or the
    backend does, so cache it (VERDICT r4 weak #6)."""
    import hashlib
    import os
    src = os.path.join(os.path.dirname(__file__),
                       "graspnerf_tpu/ops/pallas/ibrnet_fuse.py")
    h = hashlib.sha256(open(src, "rb").read()).hexdigest()[:16]
    return f"{jax.default_backend()}-{jax.devices()[0].device_kind}-{h}"


def probe_pallas_cached(cache_path="/root/repo/.pallas_probe_cache"):
    import json as _json
    key = _probe_cache_key()
    try:
        cached = _json.load(open(cache_path))
        if cached.get("key") == key:
            return cached["ok"], cached["detail"] + " [cached]"
    except Exception:
        pass
    ok, detail = probe_pallas()
    try:
        with open(cache_path, "w") as f:
            _json.dump({"key": key, "ok": ok, "detail": detail}, f)
    except Exception:
        pass
    return ok, detail


def probe_pallas(dtype=jnp.bfloat16, n=8192, tol=1.5e-2):
    """Compile + run + parity-check the Pallas view-fuse kernel on the LIVE
    backend before enabling it anywhere. A kernel that cannot pass this probe
    must never gate the flagship path (round-3 lesson: the un-gated kernel
    took down planner, trainer and bench on TPU). Returns (ok, detail).

    tol: observed bf16 err on-chip is ~7e-3 (r4); 1.5e-2 leaves 2x headroom
    without hiding real regressions (the old 3e-2 would)."""
    t0 = time.perf_counter()
    try:
        from graspnerf_tpu.ops.pallas.ibrnet_fuse import (
            view_fuse, view_fuse_reference)
        rng = np.random.RandomState(0)
        dims = {"ray_dir_fc.0": (4, 16), "ray_dir_fc.2": (16, 35),
                "neuray_fc.0": (32, 8), "neuray_fc.2": (8, 1),
                "base_fc.0": (207, 64), "base_fc.2": (64, 32),
                "vis_fc.0": (32, 32), "vis_fc.2": (32, 33),
                "vis_fc2.0": (32, 32), "vis_fc2.2": (32, 1)}
        V = 6
        rgbf = jnp.asarray(rng.rand(V, n, 35).astype(np.float32))
        neur = jnp.asarray(rng.rand(V, n, 32).astype(np.float32))
        diff = jnp.asarray((rng.rand(V, n, 4) - 0.5).astype(np.float32))
        mask = jnp.asarray((rng.rand(V, n, 1) > 0.2).astype(np.float32))
        weights = tuple(
            (jnp.asarray((rng.rand(*d) - 0.5).astype(np.float32) * 0.3),
             jnp.asarray((rng.rand(d[1]) - 0.5).astype(np.float32) * 0.1))
            for d in dims.values())
        out = jax.jit(lambda *a: view_fuse(*a, dtype=dtype))(
            rgbf, neur, diff, mask, weights)
        out = [np.asarray(o, np.float32) for o in out]
        ref = jax.jit(lambda *a: view_fuse_reference(*a, jnp.float32))(
            rgbf, neur, diff, mask, weights)
        ref = [np.asarray(o, np.float32) for o in ref]
        err = max(float(np.max(np.abs(a - b))) for a, b in zip(out, ref))
        if not np.isfinite(err) or err > tol:
            return False, f"off (parity err {err:.2e} > {tol})"
        return True, (f"on (probe ok, err {err:.2e}, "
                      f"{time.perf_counter() - t0:.0f}s)")
    except Exception as e:  # Mosaic lowering / VMEM OOM / anything
        return False, f"off ({type(e).__name__}: {str(e)[:140]})"


def build_ref(h=288, w=512, V=6):
    """Reference-scale scene inputs in pure numpy (no device D2H)."""
    from graspnerf_tpu.data.synthetic import (Scene, hemisphere_poses,
                                              intrinsics, BBOX_MIN,
                                              DEPTH_RANGE)
    sc = Scene(np.random.RandomState(0), 4)
    poses = hemisphere_poses()
    K = intrinsics(h, w)
    rgbs = np.stack([sc.render(poses[i], K, h, w)[0] for i in range(V)])
    return {"imgs": jnp.asarray(rgbs),
            "poses": jnp.asarray(poses[:V]),
            "Ks": jnp.asarray(np.tile(K[None], (V, 1, 1))),
            "depth_range": jnp.asarray(np.tile(DEPTH_RANGE[None], (V, 1))),
            "bbox3d_min": jnp.asarray(BBOX_MIN)}


def bench_volume(ref, use_pallas=False):
    """Full planner inference: encoders + 40^3 volume + grasp head."""
    from graspnerf_tpu.models import GraspNeRF
    model = GraspNeRF(renderer_cfg={"render_rgb": False,
                                    "use_depth_loss": False,
                                    "compute_dtype": "bfloat16",
                                    "use_pallas": use_pallas})
    # jitted init: eager flax init costs minutes of per-op dispatch
    # round-trips over the axon tunnel
    params = jax.jit(lambda k, r: model.init(k, {"ref": r},
                                             train=False)["params"])(
        jax.random.PRNGKey(0), ref)

    def step(params, ref, feedback):
        r = dict(ref)
        r["imgs"] = ref["imgs"] * (1.0 + 1e-6 * feedback)
        out = model.apply({"params": params}, {"ref": r}, train=False)
        return jnp.mean(out["volume"])

    compiled, dt_c, flops = _compile(step, params, ref)
    dt = slope_time(compiled, params, ref)
    return dt, flops, dt_c


def bench_render(ref, n_rays=4096, use_pallas=False):
    """Render stack: 4096 rays, 40+40 samples, color+depth compositing."""
    from graspnerf_tpu.models.renderer import NeuralRayRenderer
    model = NeuralRayRenderer(render_rgb=True, do_sample_volume=False,
                              use_depth_loss=False,
                              compute_dtype="bfloat16",
                              use_pallas=use_pallas)
    V, h, w, _ = ref["imgs"].shape
    rng = np.random.RandomState(0)
    idx = rng.randint(0, h * w, n_rays)
    coords = np.stack([idx % w, idx // w], -1).astype(np.float32)
    que = {"coords": jnp.asarray(coords[None]),
           "poses": ref["poses"][:1], "Ks": ref["Ks"][:1],
           "depth_range": ref["depth_range"][:1]}
    data = {"ref": ref, "que": que}
    params = jax.jit(lambda k, d: model.init(k, d, train=False)["params"])(
        jax.random.PRNGKey(0), data)

    def step(params, data, feedback):
        d = dict(data)
        r = dict(d["ref"])
        r["imgs"] = r["imgs"] * (1.0 + 1e-6 * feedback)
        d["ref"] = r
        out = model.apply({"params": params}, d, train=False)
        return (jnp.mean(out["pixel_colors_nr_fine"])
                + jnp.mean(out["render_depth_fine"]))

    compiled, dt_c, flops = _compile(step, params, data)
    dt = slope_time(compiled, params, data)
    return dt, flops, dt_c


def main():
    # Flagship = oracle (XLA) path — measured faster than the Pallas kernel
    # config on this chip (see module docstring). BENCH_PALLAS=1 opts into
    # the kernel (probe-verified first); BENCH_PALLAS=probe runs the probe
    # and deploys the kernel only if it passes (the r3/r4 behavior).
    import os
    force = os.environ.get("BENCH_PALLAS")
    if force == "1":
        pallas_ok, pallas_detail = True, "on (BENCH_PALLAS=1)"
    elif force == "probe":
        pallas_ok, pallas_detail = probe_pallas_cached()
    else:
        pallas_ok, pallas_detail = False, "off (oracle flagship; r5 default)"
    ref = build_ref()

    vol_dt, vol_flops, vol_cs = bench_volume(ref, use_pallas=pallas_ok)
    ren_dt, ren_flops, ren_cs = bench_render(ref, use_pallas=pallas_ok)

    res, n_rays = 40, 4096
    qps = res ** 3 / vol_dt
    rays = n_rays / ren_dt
    print(json.dumps({
        "metric": "tsdf_queries_per_s",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / REF_BASELINE_TSDF_QPS, 3),
        "volume_ms": round(vol_dt * 1e3, 3),
        "rays_per_s": round(rays, 1),
        "render_ms": round(ren_dt * 1e3, 3),
        "mfu_volume": round(vol_flops / vol_dt / PEAK_BF16_FLOPS, 4),
        "mfu_render": round(ren_flops / ren_dt / PEAK_BF16_FLOPS, 4),
        "pallas": pallas_detail,
        "compile_volume_s": round(vol_cs, 1),
        "compile_render_s": round(ren_cs, 1),
        "timing": "slope, D2H-forced (see module docstring)",
    }))


if __name__ == "__main__":
    main()
