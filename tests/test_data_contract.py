"""Roundtrip test of the vgn_syn file contract: scripts/generate_data.py
writes a scene tree, data.VGNSynDataset loads trainer batches from it, and the
poses/depths are geometrically consistent."""
import subprocess
import sys

import numpy as np
import pytest
import jax.numpy as jnp


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vgn_syn")
    out = subprocess.run(
        [sys.executable, "scripts/generate_data.py", str(root), "--scenes",
         "2", "--height", "72", "--width", "96", "--objects", "3", "--cpu"],
        capture_output=True, text=True, timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    return root


def test_database_loads(data_root):
    from graspnerf_tpu.data import VGNSynDatabase, discover_scenes
    scenes = discover_scenes(str(data_root))
    assert len(scenes) == 2
    db = VGNSynDatabase(scenes[0],
                        sdf_path=str(data_root / "sdf" /
                                     (scenes[0].split("/")[-1] + ".npz")),
                        grasp_csv=str(data_root / "grasps" /
                                      (scenes[0].split("/")[-1] + ".csv")),
                        scale=0.15)
    img = db.get_image(0)
    assert img.shape[-1] == 3 and img.max() <= 1.0
    sdf = db.get_sdf()
    assert sdf.shape == (40, 40, 40)
    assert sdf.min() >= -1.0 and sdf.max() <= 1.0
    gi = db.get_grasp_info()
    assert gi is not None
    idx, label, rot, width = gi
    assert idx.shape[1] == 3 and rot.shape[1:] == (2, 4)

    # pose roundtrip: camera centers on the r=0.5 hemisphere around (0,0,0.1)
    for i in (0, 7, 23):
        pose = db.get_pose(i)
        c = -pose[:3, :3].T @ pose[:3, 3]
        r = np.linalg.norm(c - np.array([0.0, 0.0, 0.1]))
        assert abs(r - 0.5) < 1e-4, (i, r)


def test_dataset_batches(data_root):
    from graspnerf_tpu.data import VGNSynDataset
    ds = VGNSynDataset(str(data_root), sdf_root=str(data_root / "sdf"),
                       grasp_root=str(data_root / "grasps"), n_rays=64,
                       n_grasps=8)
    b = ds.sample()
    assert b["data"]["ref"]["imgs"].shape[0] == 6
    assert b["data"]["que"]["coords"].shape == (1, 64, 2)
    assert b["sdf_gt"].shape == (40, 40, 40)
    assert b["grasp_label"].shape == (8,)
    assert "true_depth" in b
    # depth maps sane: hits start past the near plane and the bulk of the
    # image is within the workspace depth range (grazing table rays can be
    # legitimately far)
    d = b["true_depth"]
    assert (d[d > 0] > 0.1).all()
    assert 0.2 < np.median(d[d > 0]) < 1.0


def test_view_selection_hard_mode():
    from graspnerf_tpu.data import select_ref_views
    rng = np.random.RandomState(0)
    for que in range(24):
        ids = select_ref_views(6, que, rng, mode="hard")
        assert len(ids) == 6
        que_az = que % 6
        for i in ids:
            daz = min((i % 6 - que_az) % 6, (que_az - i % 6) % 6)
            assert daz >= 2, (que, i)


# ---------------------------------------------------------------------------
# Reference-descriptor replay -> generated dataset -> train step (the GIGA
# data-generation loop: ref src/gd/simulation.py:85-96 descriptors ->
# data_generator rendering -> src/nr/dataset/database.py:207-209,278-294
# GT-TSDF npz + grasps.csv contract).
@pytest.fixture(scope="module")
def replay_root(tmp_path_factory):
    from test_mesh_objects import _cube_urdf
    root = tmp_path_factory.mktemp("replay")
    assets = root / "assets"
    assets.mkdir()
    _cube_urdf(str(assets), "obj_a", h=0.018)
    _cube_urdf(str(assets), "obj_b", h=0.022)
    rng = np.random.RandomState(5)
    desc = {}
    for i, u in enumerate(["obj_a.urdf", "obj_b.urdf"]):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        desc[i] = [np.float32(0.9), q.astype(np.float32),
                   rng.uniform(0.1, 0.2, 2).astype(np.float32), u]
    ddir = root / "descs"
    ddir.mkdir()
    np.save(ddir / "scene_a.npy", np.array(desc, dtype=object),
            allow_pickle=True)
    out_root = root / "vgn_syn"
    out = subprocess.run(
        [sys.executable, "scripts/generate_data.py", str(out_root),
         "--mesh-pose-dir", str(ddir), "--asset-root", str(assets),
         "--height", "72", "--width", "96", "--grasp-candidates", "12",
         "--cpu"],
        capture_output=True, text=True, timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    return out_root


def test_replayed_scene_generates_giga_contract(replay_root):
    from graspnerf_tpu.data import VGNSynDatabase, discover_scenes
    scenes = discover_scenes(str(replay_root))
    assert len(scenes) == 1 and scenes[0].endswith("scene_a")
    db = VGNSynDatabase(scenes[0],
                        sdf_path=str(replay_root / "sdf" / "scene_a.npz"),
                        grasp_csv=str(replay_root / "grasps" / "scene_a.csv"),
                        scale=0.15)
    sdf = db.get_sdf()
    assert sdf.shape == (40, 40, 40)
    assert (sdf < 0).any() and (sdf > -1.0).any()  # objects were rendered
    idx, label, rot, width = db.get_grasp_info()
    assert len(label) == 12
    # executed labels: quaternions normalized, widths inside gripper range
    np.testing.assert_allclose(np.linalg.norm(rot, axis=-1), 1.0, atol=1e-5)
    assert (width >= 0).all() and (width <= 0.081 / (0.3 / 40)).all()
    # round-trip: the voxel indices the generator wrote come back verbatim
    # (the old meters schema shifted ~half the labels one voxel via round())
    import csv
    rows = list(csv.DictReader(open(replay_root / "grasps" / "scene_a.csv")))
    written = np.array([[int(r["i"]), int(r["j"]), int(r["k"])]
                        for r in rows])
    np.testing.assert_array_equal(idx, written)


def test_replayed_scene_trains(replay_root):
    import jax
    from graspnerf_tpu.data import VGNSynDataset
    from graspnerf_tpu.models import GraspNeRF
    from graspnerf_tpu.train import create_train_state, make_train_step

    ds = VGNSynDataset(str(replay_root), sdf_root=str(replay_root / "sdf"),
                       grasp_root=str(replay_root / "grasps"), n_rays=32,
                       n_grasps=8)
    b = ds.sample()
    # shrink the volume workload for the CPU step: 20^3 grid, GT strided 2x
    b["sdf_gt"] = b["sdf_gt"][::2, ::2, ::2]
    b["data"]["grasp_index"] = b["data"]["grasp_index"] // 2
    batch = jax.tree_util.tree_map(jnp.asarray, b)

    model = GraspNeRF(renderer_cfg=dict(volume_resolution=20,
                                        use_hierarchical_sampling=False))
    state = create_train_state(model, batch, jax.random.PRNGKey(0))
    step = make_train_step(model)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    assert np.isfinite(float(metrics["loss_vgn"]))


def test_database_name_registry(data_root):
    """parse_database_name + get_database_split (ref database.py:57-76,
    297-327)."""
    from graspnerf_tpu.data.database import (parse_database_name,
                                             get_database_split)
    from graspnerf_tpu.data import discover_scenes
    sid = discover_scenes(str(data_root))[0].split("/")[-1]
    db = parse_database_name(f"vgn_syn/train/pile/train/{sid}/w_0.15",
                             train_root=str(data_root))
    assert db.scale == 0.15
    assert db.get_image(0).shape[-1] == 3
    train_ids, val_ids = get_database_split(db, "val")
    assert val_ids == [2, 10, 18]
    assert set(train_ids) | set(val_ids) == set(range(len(db)))
    _, test_val = get_database_split(db, "test")
    assert test_val == [2, 10, 18, 0]
    import pytest as _pt
    with _pt.raises(NotImplementedError):
        parse_database_name("gso_syn/train/pile/train/x/w_0.8")


def test_view_select_nearest():
    """Distance-ranked view selection (ref utils/view_select.py:5-34)."""
    from graspnerf_tpu.data.view_select import (camera_centers,
                                                compute_nearest_camera_indices,
                                                select_working_views)
    from graspnerf_tpu.data.synthetic import hemisphere_poses
    poses = hemisphere_poses()
    c = camera_centers(poses)
    np.testing.assert_allclose(
        np.linalg.norm(c - np.array([0, 0, 0.1]), axis=-1), 0.5, atol=1e-4)
    idx = compute_nearest_camera_indices(poses)
    assert (idx[:, 0] == np.arange(len(poses))).all()  # self is nearest
    sel = select_working_views(poses, poses, 3, exclude_self=True)
    assert sel.shape == (len(poses), 3)
    assert (sel != np.arange(len(poses))[:, None]).all()
    # hemisphere layout (6 azimuths x 4 elevation rows, id stride 6 per
    # row): elevation rows are 10 deg apart vs 60 deg between azimuths, so a
    # mid-ring view's two nearest neighbors are the same azimuth one row
    # up/down: ids 8 +- 6
    assert set(sel[8][:2]) == {2, 14}
