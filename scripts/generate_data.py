"""Offline dataset generator (ref: data_generator/ + run_pile_rand.sh role).

Renders procedural scenes to the vgn_syn file contract consumed by
graspnerf_tpu.data.VGNSynDataset (and by the reference's own loader):
rgb/%04d.png, depth/%04d.exr (written as .npy fallback when EXR is
unavailable), camera_pose.npy, GT TSDF npz, grasps.csv.

  python scripts/generate_data.py out_root --scenes 10
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


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
    args = p.parse_args()

    import numpy as np
    from PIL import Image
    from graspnerf_tpu.data.synthetic import (Scene, hemisphere_poses,
                                              SyntheticSceneDataset, BBOX_MIN)
    from graspnerf_tpu.data.database import BLENDER2OPENCV
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
    for s in range(args.scenes):
        sid = f"scene_{args.seed:02d}_{s:04d}"
        sdir = base / sid
        (sdir / "rgb").mkdir(parents=True, exist_ok=True)
        (sdir / "depth").mkdir(exist_ok=True)
        (sdir / "mask").mkdir(exist_ok=True)
        scene = Scene(rng, args.objects)

        cam_world = []
        depths, exts, Ks = [], [], []
        shift = np.eye(4, dtype=np.float32)
        shift[:3, 3] = BBOX_MIN
        for i, pose in enumerate(poses):
            rgb, depth, fg = scene.render(pose, K, args.height, args.width)
            Image.fromarray((rgb * 255).astype(np.uint8)).save(
                sdir / "rgb" / ("%04d.png" % i))
            np.save(sdir / "depth" / ("%04d.npy" % i), depth)
            np.save(sdir / "mask" / ("%04d.npy" % i), fg)
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

        ds = SyntheticSceneDataset(seed=args.seed + s)
        ds_scene = ds._grasp_labels(tsdf.astype(np.float32), rng)
        idx, label, rot, width = ds_scene
        with open(grasp_dir / f"{sid}.csv", "w") as f:
            f.write("scene_id,qx,qy,qz,qw,x,y,z,width,label\n")
            for j in range(len(label)):
                x, y, z = (idx[j].astype(np.float64) + 0.5) * voxel
                qx, qy, qz, qw = rot[j, 0]
                f.write(f"{sid},{qx},{qy},{qz},{qw},{x},{y},{z},"
                        f"{width[j] * voxel},{int(label[j])}\n")
        print(f"[generate] {sid}: {args.objects} objects, "
              f"{int(label.sum())} positive grasps")


if __name__ == "__main__":
    main()
