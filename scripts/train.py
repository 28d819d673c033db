"""Training CLI (ref: train.sh + run_training.py).

Trains GraspNeRF end-to-end (renderer + grasp head). Without --data-dir it
trains on the procedural synthetic dataset (graspnerf_tpu/data/synthetic.py);
with --data-dir it expects the reference vgn_syn file contract.

Usage:
  python scripts/train.py --steps 1000 --workdir data/run0
  python scripts/train.py --small          # tiny shapes for smoke runs
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="data/train")
    p.add_argument("--steps", type=int, default=500_000)
    p.add_argument("--val-interval", type=int, default=5000)
    p.add_argument("--save-interval", type=int, default=1000)
    p.add_argument("--height", type=int, default=288)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--rays", type=int, default=512)
    p.add_argument("--small", action="store_true",
                   help="tiny shapes (64x64, res 16) for smoke testing")
    p.add_argument("--data-dir", default=None,
                   help="vgn_syn dataset root (reference file contract); "
                        "defaults to the synthetic generator")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    from graspnerf_tpu.models import GraspNeRF
    from graspnerf_tpu.data import SyntheticSceneDataset
    from graspnerf_tpu.train import Trainer

    cfg = {}
    if args.small:
        args.height = args.width = 64
        cfg["volume_resolution"] = 16

    if args.data_dir:
        from graspnerf_tpu.data.dataset import VGNSynDataset
        ds = VGNSynDataset(args.data_dir, n_rays=args.rays, seed=args.seed)
        val = [ds.sample() for _ in range(4)]
    else:
        res = cfg.get("volume_resolution", 40)
        ds = SyntheticSceneDataset(h=args.height, w=args.width,
                                   n_rays=args.rays, seed=args.seed,
                                   resolution=res)
        val_ds = SyntheticSceneDataset(h=args.height, w=args.width,
                                       n_rays=args.rays, seed=args.seed + 777,
                                       resolution=res)
        val = [jax.tree_util.tree_map(jax.numpy.asarray, val_ds.sample())
               for _ in range(2)]

    def batches():
        for b in ds:
            yield jax.tree_util.tree_map(jax.numpy.asarray, b)

    model = GraspNeRF(renderer_cfg=cfg)
    trainer = Trainer(model, batches(), val_batches=val, workdir=args.workdir,
                      total_steps=args.steps, val_interval=args.val_interval,
                      save_interval=args.save_interval, seed=args.seed)
    trainer.run()


if __name__ == "__main__":
    main()
