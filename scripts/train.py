"""Training CLI (ref: train.sh + run_training.py:9-10 `Trainer(load_cfg(cfg)).run()`).

Trains GraspNeRF end-to-end (renderer + grasp head). Configuration comes from
a YAML file (--cfg, same key scheme as the reference's configs/nrvgn_sdf.yaml)
with CLI overrides. Without --data-dir it trains on the procedural synthetic
dataset (graspnerf_tpu/data/synthetic.py); with --data-dir it expects the
reference vgn_syn file contract.

SPMD: --mesh DATA,SPACE builds a (data, space) device mesh — scenes shard over
`data` (use --scenes-per-batch >= data size), rays/TSDF columns over `space`.

Usage:
  python scripts/train.py --cfg configs/nrvgn_sdf.yaml --steps 1000
  python scripts/train.py --small                         # smoke run
  python scripts/train.py --mesh 2,4 --scenes-per-batch 2 # 8-device SPMD
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default=None, help="YAML config path")
    p.add_argument("--workdir", default="data/train")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--val-interval", type=int, default=None)
    p.add_argument("--save-interval", type=int, default=1000)
    p.add_argument("--log-every", type=int, default=None,
                   help="metrics cadence (steps); 1 = per-step diagnostics")
    p.add_argument("--height", type=int, default=288)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--rays", type=int, default=None)
    p.add_argument("--small", action="store_true",
                   help="tiny shapes (64x64, res 16) for smoke testing")
    p.add_argument("--data-dir", default=None,
                   help="vgn_syn dataset root (reference file contract); "
                        "defaults to the synthetic generator")
    p.add_argument("--sdf-dir", default=None)
    p.add_argument("--grasp-dir", default=None)
    p.add_argument("--mesh", default=None,
                   help="DATA,SPACE mesh shape over jax.devices(), e.g. 2,4")
    p.add_argument("--scenes-per-batch", type=int, default=1)
    p.add_argument("--workers", type=int, default=4,
                   help="prefetch worker threads (0 = synchronous)")
    p.add_argument("--compute-dtype", default=None,
                   choices=[None, "float32", "bfloat16"])
    p.add_argument("--use-pallas", action="store_true",
                   help="enable the Pallas view-fuse kernel (verified-on-TPU "
                        "path; forward = kernel, backward = recompute "
                        "through the jnp reference)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    # repo-level persistent cache: workdir-scoped caches made every new run
    # pay the full ~6 min train-step compile again
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    from graspnerf_tpu.config import (load_cfg, renderer_cfg_from,
                                      trainer_cfg_from)
    from graspnerf_tpu.data import SyntheticSceneDataset
    from graspnerf_tpu.data.prefetch import PrefetchLoader, collate_scenes
    from graspnerf_tpu.train import Trainer

    ycfg = load_cfg(args.cfg) if args.cfg else {}
    rcfg = renderer_cfg_from(ycfg)
    tcfg = trainer_cfg_from(ycfg)
    if args.steps is not None:
        tcfg["total_steps"] = args.steps
    if args.val_interval is not None:
        tcfg["val_interval"] = args.val_interval
    n_rays = args.rays or ycfg.get("ray_num", 512)
    if args.compute_dtype:
        rcfg["compute_dtype"] = args.compute_dtype
    if args.use_pallas:
        rcfg["use_pallas"] = True

    if args.small:
        args.height = args.width = 64
        rcfg["volume_resolution"] = 16
    res = rcfg.get("volume_resolution", 40)

    mesh = None
    if args.mesh:
        from graspnerf_tpu.parallel import make_mesh, SPACE_AXIS
        n_data, n_space = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(n_data, n_space)
        rcfg["space_axis"] = SPACE_AXIS
        if args.scenes_per_batch % n_data != 0:
            p.error("--scenes-per-batch must be a multiple of the data-axis "
                    f"size ({n_data})")

    if args.data_dir:
        from graspnerf_tpu.data.dataset import VGNSynDataset
        from graspnerf_tpu.data.database import discover_scenes

        # Held-out validation SCENES (ref asset.py train/val scene lists):
        # an on-disk val split when present, else the last train scene(s)
        # withheld from training. Validation never draws from the training
        # distribution sampler.
        train_scenes = discover_scenes(args.data_dir, ("pile", "packed"),
                                       "train")
        val_scenes = discover_scenes(args.data_dir, ("pile", "packed"), "val")
        if not val_scenes and len(train_scenes) > 1:
            n_hold = max(1, len(train_scenes) // 10)
            val_scenes = train_scenes[-n_hold:]
            train_scenes = train_scenes[:-n_hold]

        def factory(seed, scenes=train_scenes):
            return VGNSynDataset(args.data_dir, sdf_root=args.sdf_dir,
                                 grasp_root=args.grasp_dir, n_rays=n_rays,
                                 seed=seed, scenes=scenes)

        if not val_scenes:
            print("WARNING: no held-out val scenes (single train scene, no "
                  "on-disk val split) — validating ON THE TRAINING SCENE; "
                  "val metrics will not measure generalization",
                  file=sys.stderr)
        val_ds = factory(args.seed + 777_777,
                         scenes=val_scenes or train_scenes)
    else:
        def factory(seed):
            return SyntheticSceneDataset(h=args.height, w=args.width,
                                         n_rays=n_rays, seed=seed,
                                         resolution=res)

        val_ds = factory(args.seed + 777_777)
    val = [jax.tree_util.tree_map(jax.numpy.asarray, val_ds.sample())
           for _ in range(2)]

    if args.workers > 0:
        train_iter = PrefetchLoader(factory, num_workers=args.workers,
                                    scenes_per_batch=args.scenes_per_batch,
                                    seed=args.seed)
    else:
        ds = factory(args.seed)

        def sync_batches():
            while True:
                yield collate_scenes(
                    [ds.sample() for _ in range(args.scenes_per_batch)])
        train_iter = sync_batches()

    from graspnerf_tpu.config import name2network, _populate
    _populate()
    cls = name2network[ycfg.get("network", "grasp_nerf")]
    model = cls(renderer_cfg=rcfg)

    extra = {}
    if args.log_every is not None:
        extra["log_every"] = args.log_every
    trainer = Trainer(model, train_iter, val_batches=val,
                      workdir=args.workdir,
                      save_interval=args.save_interval, seed=args.seed,
                      mesh=mesh, scene_batch=True,
                      val_image_dir=str(Path(args.workdir) / "vis_val"),
                      **tcfg, **extra)
    trainer.run()


if __name__ == "__main__":
    main()
