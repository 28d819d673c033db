"""Triangle-mesh objects + reference mesh_pose_list descriptor replay.

Covers sim/mesh.py (OBJ/URDF loaders, MeshObject queries), the mixed
prim+mesh PrimScene.trace path (numpy vs native BVH), and
ClutterRemovalSim.reset_from_mesh_pose_list (ref src/gd/simulation.py:85-96,
158-203)."""
import os

import numpy as np
import pytest

from graspnerf_tpu.sim.mesh import (MeshObject, load_mesh_pose_list,
                                    load_obj, mesh_from_urdf,
                                    moller_trumbore, save_mesh_pose_list)
from graspnerf_tpu.sim.objects import PrimObject, PrimScene, TYPE_BOX
from graspnerf_tpu.sim.simulation import ClutterRemovalSim
from graspnerf_tpu.sim.transform import Rotation


def _cube_obj(path, h=0.02):
    """Axis-aligned cube [-h,h]^3 as an OBJ with outward-facing quads."""
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)], np.float32)
    # quads by face (1-indexed), wound outward
    quads = [(1, 2, 4, 3), (5, 7, 8, 6), (1, 5, 6, 2), (3, 4, 8, 7),
             (1, 3, 7, 5), (2, 6, 8, 4)]
    with open(path, "w") as f:
        for p in v:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for q in quads:
            f.write("f " + " ".join(str(i) for i in q) + "\n")
    return v


def _cube_urdf(dirpath, name="cube", h=0.02, scale=1.0):
    obj_path = os.path.join(dirpath, f"{name}.obj")
    _cube_obj(obj_path, h)
    urdf_path = os.path.join(dirpath, f"{name}.urdf")
    with open(urdf_path, "w") as f:
        f.write(f"""<?xml version="1.0"?>
<robot name="{name}"><link name="base">
  <collision><geometry>
    <mesh filename="{name}.obj" scale="{scale} {scale} {scale}"/>
  </geometry></collision>
</link></robot>""")
    return urdf_path


@pytest.fixture
def cube(tmp_path):
    verts, faces = load_obj(str(_cube_urdf(str(tmp_path)) and
                                os.path.join(str(tmp_path), "cube.obj")))
    return MeshObject(verts, faces)


def test_load_obj_fan_triangulation(tmp_path):
    p = os.path.join(str(tmp_path), "c.obj")
    _cube_obj(p)
    verts, faces = load_obj(p)
    assert verts.shape == (8, 3)
    assert faces.shape == (12, 3)  # 6 quads -> 12 triangles


def test_mesh_from_urdf_scale(tmp_path):
    urdf = _cube_urdf(str(tmp_path), scale=2.5)
    mesh_path, scale = mesh_from_urdf(urdf)
    assert os.path.exists(mesh_path)
    np.testing.assert_allclose(scale, [2.5, 2.5, 2.5])


def test_mesh_matches_box_queries(cube, rng):
    """A cube mesh must agree with the analytic box primitive."""
    box = PrimObject(TYPE_BOX, [0.02, 0.02, 0.02])
    pts = rng.uniform(-0.06, 0.06, (256, 3)).astype(np.float32)
    d_mesh = cube.sdf(pts)
    d_box = box.sdf(pts)
    # sampled-surface SDF: sign exact, magnitude within sample spacing
    assert np.all(np.sign(d_mesh[np.abs(d_box) > 4e-3])
                  == np.sign(d_box[np.abs(d_box) > 4e-3]))
    np.testing.assert_allclose(d_mesh, d_box, atol=6e-3)

    o = np.tile(np.array([[0.0, 0.0, 0.1]], np.float32), (64, 1))
    dirs = rng.randn(64, 3).astype(np.float32)
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 0.5
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    t_m, n_m = cube.intersect(o, dirs)
    t_b, n_b = box.intersect(o, dirs)
    hit = np.isfinite(t_b)
    np.testing.assert_allclose(t_m[hit], t_b[hit], atol=1e-5)
    np.testing.assert_allclose(n_m[hit], n_b[hit], atol=1e-4)
    assert np.array_equal(np.isfinite(t_m), hit)


def test_mesh_volume_and_bounds(cube):
    np.testing.assert_allclose(cube.volume, 0.04 ** 3, rtol=1e-5)
    assert 0.02 <= cube.radius_bound <= 0.04
    np.testing.assert_allclose(cube.min_width, 0.04, atol=5e-3)
    sp = cube.surface_points(256)
    assert np.abs(sp).max() <= 0.02 + 1e-5
    assert (np.abs(np.abs(sp).max(-1) - 0.02) < 1e-5).all()


def test_posed_mesh_sdf_sign(cube, rng):
    R = Rotation.from_rotvec([0.3, -0.2, 0.7]).as_matrix().astype(np.float32)
    cube.R, cube.t = R, np.array([0.05, -0.02, 0.03], np.float32)
    inside = cube.t[None] + (R @ np.array([0.01, 0.0, 0.0])).astype(
        np.float32)[None]
    outside = cube.t[None] + np.array([[0.0, 0.0, 0.1]], np.float32)
    assert cube.sdf(inside)[0] < 0
    assert cube.sdf(outside)[0] > 0


def test_scene_trace_mixed_native_vs_numpy(tmp_path, rng, monkeypatch):
    """Mixed prim+mesh scene: native (BVH) and numpy traces agree."""
    p = os.path.join(str(tmp_path), "c.obj")
    _cube_obj(p)
    verts, faces = load_obj(p)
    mesh = MeshObject(verts, faces, t=[0.04, 0.0, 0.02])
    prim = PrimObject(TYPE_BOX, [0.02, 0.02, 0.02], t=[-0.05, 0.0, 0.02])
    scene = PrimScene([prim, mesh])

    o = rng.uniform(-0.1, 0.1, (500, 3)).astype(np.float32)
    o[:, 2] = 0.25
    d = np.tile(np.array([[0, 0, -1]], np.float32), (500, 1))

    from graspnerf_tpu.data import native
    if not native.tris_available():
        pytest.skip("native tracer not built")
    t_n, n_n, id_n = scene.trace(o, d)
    monkeypatch.setattr(native, "prims_available", lambda: False)
    monkeypatch.setattr(native, "tris_available", lambda: False)
    t_p, n_p, id_p = scene.trace(o, d)
    hit = np.isfinite(t_p)
    assert np.array_equal(np.isfinite(t_n), hit)
    np.testing.assert_allclose(t_n[hit], t_p[hit], atol=1e-5)
    np.testing.assert_allclose(n_n[hit], n_p[hit], atol=1e-4)
    assert np.array_equal(id_n, id_p)
    assert (id_p == 0).any() and (id_p == 1).any() \
        and (id_p == scene.table_id).any()


def test_mesh_pose_list_roundtrip_and_replay(tmp_path):
    """GENUINE reference-range descriptor -> replayed settled scene.

    The reference samples pile xy in [size/3, 2size/3] = [0.1, 0.2] of its
    corner-origin workspace (ref src/gd/simulation.py:180); the loader must
    translate those into this repo's center-origin frame ([-0.05, 0.05])
    instead of consuming them verbatim (which would park the pile at the
    workspace corner and silently discard objects)."""
    root = str(tmp_path)
    urdf1 = _cube_urdf(root, "obj_a", h=0.018)
    urdf2 = _cube_urdf(root, "obj_b", h=0.022, scale=0.9)
    rng = np.random.RandomState(3)
    desc = {}
    for i, urdf in enumerate([urdf1, urdf2]):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        desc[i] = [np.float32(rng.uniform(0.8, 1.0)),
                   q.astype(np.float32),
                   rng.uniform(0.1, 0.2, 2).astype(np.float32),  # ref range
                   os.path.basename(urdf)]  # relative path + asset_root
    path = os.path.join(root, "scene.npy")
    np.save(path, np.array(desc, dtype=object), allow_pickle=True)

    entries = load_mesh_pose_list(path, asset_root=root, scene="pile")
    assert len(entries) == 2
    np.testing.assert_allclose(entries[0]["mesh"].scale, desc[0][0])
    # corner-origin -> center-origin translation applied on load
    np.testing.assert_allclose(entries[0]["drop_t"][:2],
                               desc[0][2] - 0.15, atol=1e-6)

    sim = ClutterRemovalSim("pile", rng=np.random.RandomState(0))
    scene = sim.reset_from_mesh_pose_list(path, asset_root=root)
    assert len(scene) == 2
    for ob in scene.objects:
        # settled on/near the table, near the workspace CENTER
        low = ob.surface_points(256, np.random.RandomState(1))[:, 2].min()
        assert -5e-3 <= low <= 0.06
        assert np.all(np.abs(ob.t[:2]) < 0.08)

    # rest-pose save -> reload replays without re-randomization (save shifts
    # back into the reference frame; load undoes it)
    out = os.path.join(root, "rest.npy")
    save_mesh_pose_list(out, [{"mesh": ob, "urdf": e["urdf"]}
                              for ob, e in zip(scene.objects, entries)])
    raw = np.load(out, allow_pickle=True).item()
    assert all(v[2][0] >= 0 for v in raw.values())  # stored corner-origin
    entries2 = load_mesh_pose_list(out, asset_root=root, scene="pile")
    np.testing.assert_allclose(entries2[0]["mesh"].t, scene.objects[0].t,
                               atol=1e-6)


def test_mesh_pose_list_insertion_order(tmp_path):
    """Rest-pose dicts are keyed by body_uid strings; the reference consumes
    dict.values() in insertion order, so '10' must not sort before '2'."""
    root = str(tmp_path)
    urdf = _cube_urdf(root, "obj_a", h=0.018)
    q = np.array([0, 0, 0, 1], np.float32)
    desc = {"2": [np.float32(1.0), q, np.array([0.12, 0.12], np.float32),
                  os.path.basename(urdf)],
            "10": [np.float32(0.9), q, np.array([0.18, 0.18], np.float32),
                   os.path.basename(urdf)]}
    path = os.path.join(root, "scene.npy")
    np.save(path, np.array(desc, dtype=object), allow_pickle=True)
    entries = load_mesh_pose_list(path, asset_root=root, scene="pile")
    np.testing.assert_allclose([e["mesh"].scale for e in entries],
                               [1.0, 0.9], rtol=1e-6)


def test_mesh_pose_list_packed_replay(tmp_path):
    """Packed entries are placed upright at the recorded xy with z = half the
    AABB height (ref :245-248) and REJECTED on contact, not drop-stacked."""
    root = str(tmp_path)
    urdf = _cube_urdf(root, "obj_a", h=0.02)
    # two entries at the same spot: the second must be rejected
    desc = {0: [np.float32(1.0), np.float32(0.3), np.float32(0.15),
                np.float32(0.15), os.path.basename(urdf)],
            1: [np.float32(1.0), np.float32(1.2), np.float32(0.152),
                np.float32(0.15), os.path.basename(urdf)],
            2: [np.float32(1.0), np.float32(0.0), np.float32(0.08),
                np.float32(0.08), os.path.basename(urdf)]}
    path = os.path.join(root, "scene.npy")
    np.save(path, np.array(desc, dtype=object), allow_pickle=True)
    sim = ClutterRemovalSim("packed", rng=np.random.RandomState(0))
    scene = sim.reset_from_mesh_pose_list(path, asset_root=root)
    assert len(scene) == 2  # overlapping second entry rejected
    for ob in scene.objects:
        # upright at half-height (+2 mm placement gap, closed by settling)
        assert 0.0195 <= ob.t[2] <= 0.0225
    np.testing.assert_allclose(scene.objects[0].t[:2], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(scene.objects[1].t[:2], [-0.07, -0.07],
                               atol=1e-6)


def test_grasp_on_mesh_object(tmp_path):
    """A mesh cube sitting alone is graspable by the oracle-style grasp."""
    p = os.path.join(str(tmp_path), "c.obj")
    _cube_obj(p, h=0.015)
    verts, faces = load_obj(p)
    sim = ClutterRemovalSim("pile", rng=np.random.RandomState(0))
    sim.scene = PrimScene([MeshObject(verts, faces, t=[0.0, 0.0, 0.015])])

    from graspnerf_tpu.sim.grasp import Grasp, Label
    from graspnerf_tpu.sim.transform import Rotation as R, Transform
    # top-down grasp, fingers closing along world y
    rot = R.from_matrix(np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]],
                                 np.float32))
    g = Grasp(Transform(rot, [0.0, 0.0, 0.012]), width=0.08)
    (label, width), _ = sim.execute_grasp(g)
    assert label == Label.SUCCESS
    assert 0.02 <= width <= 0.04
