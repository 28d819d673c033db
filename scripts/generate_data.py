"""Offline dataset generator (ref: data_generator/ + run_pile_rand.sh role).

Renders scenes to the vgn_syn file contract consumed by
graspnerf_tpu.data.VGNSynDataset (and by the reference's own loader):
rgb/%04d.png, depth/%04d.exr + mask/%04d.exr (standard scanline EXR via
data/exr.py), camera_pose.npy, GT TSDF npz, grasps.csv (reference i,j,k
voxel-index schema).

Two scene sources:
  * procedural primitives (default) — self-contained synthetic scenes;
  * --mesh-pose-dir DIR — replay reference-format `mesh_pose_list`
    descriptors (ref src/gd/simulation.py:85-96,158-271) through
    ClutterRemovalSim.reset_from_mesh_pose_list, render with the
    domain-randomizing tracer (ref rd/render.py role), and label grasps by
    PHYSICALLY EXECUTING candidates in the replayed scene — the GIGA
    labeling process the reference's grasps.csv files come from
    (ref src/nr/dataset/database.py:278-294).

  python scripts/generate_data.py out_root --scenes 10
  python scripts/generate_data.py out_root --mesh-pose-dir descs/ \
      --asset-root assets/ --scene-type pile
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def executed_grasp_labels(sim, tsdf, rng, n_grasps, voxel, bbox_min):
    """GIGA-style labels: candidate centers on the observed TSDF surface
    band, approach in a ~30 deg cone about straight-down with random yaw,
    each candidate executed in the (unmodified) sim; label = physical
    success, width = measured closing width."""
    import numpy as np
    from graspnerf_tpu.sim.grasp import Label
    from graspnerf_tpu.sim.transform import Rotation, Transform

    res = tsdf.shape[0]
    near = np.argwhere((np.abs(tsdf) < 0.3) & (tsdf != -1.0))
    if len(near) == 0:
        near = np.stack(np.unravel_index(
            rng.randint(0, res ** 3, 64), tsdf.shape), -1)
    flip = np.diag([1.0, -1.0, -1.0])  # gripper z -> world -z
    idx, labels, quats, widths = [], [], [], []
    for _ in range(n_grasps):
        v = near[rng.randint(0, len(near))]
        pos = (v.astype(np.float64) + 0.5) * voxel + bbox_min  # world
        yaw = rng.uniform(0, 2 * np.pi)
        tilt, taz = rng.uniform(0, np.pi / 6), rng.uniform(0, 2 * np.pi)
        Rm = (Rotation.from_rotvec(
                  tilt * np.array([np.cos(taz), np.sin(taz), 0.0]))
              .as_matrix() @ flip
              @ Rotation.from_rotvec([0, 0, yaw]).as_matrix())
        rot = Rotation.from_matrix(Rm)
        (label, width), _ = sim.execute_grasp(
            (Transform(rot, pos), sim.gripper.max_opening_width),
            remove=False)
        idx.append(v)
        labels.append(float(label == Label.SUCCESS))
        quats.append(rot.as_quat())
        widths.append(width / voxel)
    return (np.asarray(idx, np.int32), np.asarray(labels, np.float32),
            np.asarray(quats, np.float32), np.asarray(widths, np.float32))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("--scenes", type=int, default=4)
    p.add_argument("--scene-type", default="pile")
    p.add_argument("--split", default="train")
    p.add_argument("--height", type=int, default=288)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--objects", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh-pose-dir", default=None,
                   help="directory of reference mesh_pose_list descriptors "
                        "to replay instead of procedural scenes")
    p.add_argument("--asset-root", default="",
                   help="root for relative URDF paths in descriptors")
    p.add_argument("--grasp-candidates", type=int, default=40,
                   help="executed grasp candidates per simulated scene")
    p.add_argument("--executed-labels", action="store_true",
                   help="procedural scenes: build them in ClutterRemovalSim "
                        "and label grasps by physical execution (like the "
                        "descriptor-replay path) instead of the geometric "
                        "heuristic")
    p.add_argument("--cpu", action="store_true",
                   help="pin jax to CPU (the only jax use is the small TSDF "
                        "integration; avoids depending on an accelerator "
                        "tunnel for a host-side data tool)")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from PIL import Image
    from graspnerf_tpu.data.synthetic import (Scene, hemisphere_poses,
                                              SyntheticSceneDataset, BBOX_MIN)
    from graspnerf_tpu.data.database import BLENDER2OPENCV
    from graspnerf_tpu.data.exr import write_exr
    from graspnerf_tpu.ops.tsdf import integrate_tsdf, VOLUME_SIZE

    rng = np.random.RandomState(args.seed)
    poses = hemisphere_poses()
    # reference intrinsics at scale 0.8 of 1280x720/2 (vgn_syn)
    K = np.array([[892.62, 0, 639.5], [0, 892.62, 359.5], [0, 0, 1]],
                 np.float32)
    K = K * np.array([[args.width / 1280], [args.height / 720], [1]],
                     np.float32)
    K[0, 2] = args.width / 2 - 0.5
    K[1, 2] = args.height / 2 - 0.5

    base = Path(args.root) / args.scene_type / args.split
    sdf_dir = Path(args.root) / "sdf"
    grasp_dir = Path(args.root) / "grasps"
    for d in (base, sdf_dir, grasp_dir):
        d.mkdir(parents=True, exist_ok=True)

    voxel = 0.3 / 40

    if args.mesh_pose_dir:
        descs = sorted(p for p in Path(args.mesh_pose_dir).iterdir()
                       if p.suffix in (".npy", ".npz"))
        if not descs:
            raise FileNotFoundError(f"no descriptors in {args.mesh_pose_dir}")
        jobs = [(d.stem, d) for d in descs]
    else:
        jobs = [(f"scene_{args.seed:02d}_{s:04d}", None)
                for s in range(args.scenes)]

    for s, (sid, desc) in enumerate(jobs):
        sdir = base / sid
        (sdir / "rgb").mkdir(parents=True, exist_ok=True)
        (sdir / "depth").mkdir(exist_ok=True)
        (sdir / "mask").mkdir(exist_ok=True)

        if desc is None and not args.executed_labels:
            scene = Scene(rng, args.objects)
            render = lambda pose: scene.render(pose, K, args.height,
                                               args.width)
            sim = None
        else:
            # simulated scene (descriptor replay OR procedural sim.reset):
            # grasp labels come from PHYSICALLY EXECUTING candidates in this
            # same world — the supervision the campaign sim actually tests
            # (heuristic labels trained a planner to 2% SR in the r5
            # campaign; executed labels are the GIGA labeling process)
            from graspnerf_tpu.sim.simulation import ClutterRemovalSim
            from graspnerf_tpu.sim.render import DomainRandomizer
            sim = ClutterRemovalSim(args.scene_type,
                                    rng=np.random.RandomState(args.seed + s))
            if desc is None:
                sim.reset(args.objects)
            else:
                sim.reset_from_mesh_pose_list(str(desc), args.asset_root)
            randomizer = DomainRandomizer(np.random.RandomState(args.seed + s))
            randomizer.init_scene(sim.scene)
            render = lambda pose: sim.observe(pose, K, args.height,
                                              args.width, randomizer)

        cam_world = []
        depths, exts, Ks = [], [], []
        shift = np.eye(4, dtype=np.float32)
        shift[:3, 3] = BBOX_MIN
        for i, pose in enumerate(poses):
            rgb, depth, fg = render(pose)
            Image.fromarray((rgb * 255).astype(np.uint8)).save(
                sdir / "rgb" / ("%04d.png" % i))
            # reference byte contract: depth/mask as EXR
            # (ref dataset/database.py:129-198; data/exr.py writer)
            write_exr(str(sdir / "depth" / ("%04d.exr" % i)),
                      depth.astype(np.float32))
            write_exr(str(sdir / "mask" / ("%04d.exr" % i)),
                      fg.astype(np.float32))
            ext = np.eye(4, dtype=np.float32)
            ext[:3, :] = pose
            # store cam→world in Blender axes so the loader's inverse matches
            cam_world.append(np.linalg.inv(ext) @ np.linalg.inv(BLENDER2OPENCV))
            depths.append(depth)
            exts.append(ext @ shift)
            Ks.append(K)
        np.save(sdir / "camera_pose.npy", np.stack(cam_world))

        tsdf, wgt = integrate_tsdf(np.stack(depths), np.stack(Ks),
                                   np.stack(exts), VOLUME_SIZE, 40)
        tsdf = np.where(np.asarray(wgt) > 0, np.asarray(tsdf), -1.0)
        # stored in [0,1] like the reference's GT npz (database.py:207-209)
        np.savez_compressed(sdf_dir / f"{sid}.npz",
                            grid=((tsdf + 1.0) / 2.0)[None].astype(np.float32))

        if sim is not None:
            idx, label, q1, width = executed_grasp_labels(
                sim, tsdf.astype(np.float32), rng, args.grasp_candidates,
                voxel, BBOX_MIN)
            rot = q1[:, None]  # csv stores one quat; loader adds symmetry
            width_vox = width
        else:
            ds = SyntheticSceneDataset(seed=args.seed + s)
            idx, label, rot, width_vox = ds._grasp_labels(
                tsdf.astype(np.float32), rng)
        # Reference grasps.csv schema: voxel-index columns i,j,k + width in
        # voxels, read back verbatim by the loader (ref database.py:278-294
        # reads i,j,k and width with no unit conversion). Writing indices
        # directly (not center-of-voxel meters) avoids the half-voxel
        # rounding boundary that shifted ~half the labels one voxel.
        with open(grasp_dir / f"{sid}.csv", "w") as f:
            f.write("scene_id,qx,qy,qz,qw,i,j,k,width,label\n")
            for j in range(len(label)):
                gi, gj, gk = idx[j].astype(np.int64)
                qx, qy, qz, qw = rot[j, 0]
                f.write(f"{sid},{qx},{qy},{qz},{qw},{gi},{gj},{gk},"
                        f"{width_vox[j]},{int(label[j])}\n")
        print(f"[generate] {sid}: "
              f"{len(sim.scene) if sim is not None else args.objects} "
              f"objects, {int(label.sum())} positive grasps")


if __name__ == "__main__":
    main()
