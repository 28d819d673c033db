"""Closed-loop sim grasping CLI (ref: scripts/sim_grasp.py + run_simgrasp.sh).

Runs the clutter-removal experiment with the GraspNeRF planner on the
SimWorld (ClutterRemovalSim scenes + domain-randomized rendering + ray-cast
gripper state machine). With --random-planner it runs a no-model baseline
(random top-down grasps); --world analytic selects the smoke-test world.

  python scripts/sim_grasp.py --rounds 5 --logdir data/simgrasp
  python scripts/sim_grasp.py --ckpt data/train/ckpt/best --rounds 200 \
      --scene packed
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def random_planner_factory(seed=0):
    """No-model baseline: random near-top-down grasps over the workspace
    (the floor any learned planner must beat)."""
    import numpy as np
    from graspnerf_tpu.sim.transform import Transform, Rotation

    rng = np.random.RandomState(seed)

    def planner(images, extrinsics, Ks, depth_range, round_idx, n_grasp):
        grasps = []
        for _ in range(4):
            # volume-local position (shifted by BBOX_MIN in the harness)
            pos = rng.uniform([0.05, 0.05, 0.055], [0.25, 0.25, 0.15])
            yaw = rng.uniform(0, 2 * np.pi)
            cy, sy = np.cos(yaw), np.sin(yaw)
            # z-axis down (approach), x/y spun by yaw
            R = np.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, -1.0]])
            R[:, 0] = np.cross(R[:, 1], R[:, 2])  # right-handed
            grasps.append((Transform(Rotation.from_matrix(R), pos), 0.08))
        return grasps, rng.rand(4), 0.0
    return planner


def model_planner_factory(ckpt: str | None, small: bool):
    import jax
    import numpy as np
    from graspnerf_tpu.models import GraspNeRF
    from graspnerf_tpu.detect import GraspNeRFPlanner

    cfg = {"render_rgb": False, "use_depth_loss": False}
    if small:
        cfg["volume_resolution"] = 16
    if ckpt:
        from graspnerf_tpu.detect.planner import load_checkpoint_params
        params = load_checkpoint_params(ckpt)
    else:
        # randomly initialised model — exercises the full pipeline
        from graspnerf_tpu.data import SyntheticSceneDataset
        ds = SyntheticSceneDataset(h=96, w=128, n_rays=32, seed=0,
                                   fuse_views=6,
                                   resolution=cfg.get("volume_resolution", 40))
        batch = jax.tree_util.tree_map(jax.numpy.asarray, ds.sample())
        model = GraspNeRF(renderer_cfg=cfg)
        params = model.init(jax.random.PRNGKey(0), batch["data"],
                            train=False)["params"]
    planner = GraspNeRFPlanner(params, renderer_cfg=cfg, qual_threshold=0.5)

    def call(images, extrinsics, Ks, depth_range, round_idx, n_grasp):
        return planner(images, extrinsics, Ks, depth_range, round_idx, n_grasp)
    return call


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", default="data/simgrasp")
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--objects", type=int, default=4)
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    p.add_argument("--random-planner", action="store_true")
    p.add_argument("--small", action="store_true")
    p.add_argument("--scene", default="pile", choices=["pile", "packed"])
    p.add_argument("--world", default="sim", choices=["sim", "analytic"])
    p.add_argument("--height", type=int, default=96)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import numpy as np
    from graspnerf_tpu.sim import clutter_removal
    from graspnerf_tpu.sim.world import AnalyticWorld, SimWorld

    if args.random_planner:
        planner = random_planner_factory(args.seed)
    else:
        planner = model_planner_factory(args.ckpt, args.small)

    rng = np.random.RandomState(args.seed)
    world = (SimWorld(args.scene, rng=rng) if args.world == "sim"
             else AnalyticWorld(rng))
    metrics = clutter_removal.run(planner, args.logdir, n_rounds=args.rounds,
                                  n_objects=args.objects, seed=args.seed,
                                  world=world, scene=args.scene,
                                  h=args.height, w=args.width)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
