"""Tests for the physics-free simulation harness (sim/objects, sim/simulation,
sim/render): primitive geometry consistency, native-tracer parity, scene
generation invariants, the gripper state machine, and the rd/-contract
renderer."""
import os

import numpy as np
import pytest

from graspnerf_tpu.sim import (ClutterRemovalSim, DomainRandomizer, Grasp,
                               Label, PrimObject, PrimScene, Rotation,
                               Transform, random_object, render_scene,
                               render_views_to_dir)
from graspnerf_tpu.sim.objects import (TYPE_BOX, TYPE_CAPSULE, TYPE_CYLINDER,
                                       TYPE_SPHERE)


def _random_scene(rng, n=5):
    scene = PrimScene()
    for _ in range(n):
        ob = random_object(rng)
        q = rng.randn(4)
        ob.R = Rotation.from_quat(q / np.linalg.norm(q)).as_matrix().astype(
            np.float32)
        ob.t = rng.uniform(-0.1, 0.1, 3).astype(np.float32)
        ob.t[2] = rng.uniform(0.02, 0.15)
        scene.add(ob)
    return scene


def _rays_at(scene, rng, n=400):
    """Random rays aimed at the objects from outside."""
    origins, dirs = [], []
    for _ in range(n):
        ob = scene.objects[rng.randint(len(scene))]
        target = ob.t + rng.randn(3) * 0.01
        d = rng.randn(3)
        d /= np.linalg.norm(d)
        o = target - d * 0.5
        origins.append(o)
        dirs.append(d)
    return (np.asarray(origins, np.float32), np.asarray(dirs, np.float32))


def test_sdf_intersect_consistency():
    """Ray hit points must lie on the zero level set of the hit object."""
    rng = np.random.RandomState(0)
    for kind in (TYPE_SPHERE, TYPE_BOX, TYPE_CYLINDER, TYPE_CAPSULE):
        ob = random_object(rng, kinds=(kind,))
        q = rng.randn(4)
        ob.R = Rotation.from_quat(q / np.linalg.norm(q)).as_matrix().astype(
            np.float32)
        ob.t = np.array([0.02, -0.01, 0.1], np.float32)
        o, d = _rays_at(PrimScene([ob]), rng, 200)
        t, n = ob.intersect(o, d)  # numpy path directly
        hit = np.isfinite(t)
        assert hit.mean() > 0.5, f"kind {kind}: too few hits"
        p = o[hit] + d[hit] * t[hit][:, None]
        sd = ob.sdf(p)
        np.testing.assert_allclose(sd, 0.0, atol=2e-4)
        # normals are unit and point against the ray
        nn = n[hit]
        np.testing.assert_allclose(np.linalg.norm(nn, axis=-1), 1.0,
                                   atol=1e-3)
        assert (np.sum(nn * d[hit], -1) < 1e-3).all()


def test_native_prim_tracer_parity():
    from graspnerf_tpu.data import native
    if not native.prims_available():
        pytest.skip("native tracer not built")
    rng = np.random.RandomState(1)
    scene = _random_scene(rng, 6)
    o, d = _rays_at(scene, rng, 500)
    prims = np.stack([ob.flat() for ob in scene.objects])
    tn, nn, idn = native.trace_prims(prims, o, d, True)
    # numpy oracle (exclude=-2 disables the native fast path, hits nothing)
    t_ref = np.full(len(o), np.inf, np.float32)
    n_ref = np.zeros((len(o), 3), np.float32)
    id_ref = np.full(len(o), -1, np.int32)
    for i, ob in enumerate(scene.objects):
        t, n = ob.intersect(o, d)
        hit = t < t_ref
        t_ref, n_ref = np.where(hit, t, t_ref), np.where(hit[:, None], n,
                                                         n_ref)
        id_ref = np.where(hit, i, id_ref)
    dz = d[:, 2]
    tt = np.where(np.abs(dz) > 1e-9, -o[:, 2] / np.where(
        np.abs(dz) > 1e-9, dz, 1.0), np.inf)
    hit = (tt > 1e-5) & (tt < t_ref)
    t_ref = np.where(hit, tt, t_ref)
    id_ref = np.where(hit, scene.table_id, id_ref)
    n_ref = np.where(hit[:, None], np.array([0, 0, 1], np.float32), n_ref)

    both = np.isfinite(tn) & np.isfinite(t_ref)
    assert (np.isfinite(tn) == np.isfinite(t_ref)).mean() > 0.995
    close = np.abs(tn[both] - t_ref[both]) < 1e-4
    assert close.mean() > 0.99
    assert (idn[both][close] == id_ref[both][close]).all()
    np.testing.assert_allclose(nn[both][close], n_ref[both][close], atol=1e-3)


@pytest.mark.parametrize("scene_type", ["pile", "packed", "single"])
def test_scene_generation(scene_type):
    sim = ClutterRemovalSim(scene_type, rng=np.random.RandomState(3))
    n = 1 if scene_type == "single" else 5
    sim.reset(n)
    assert 1 <= sim.num_objects <= n
    for i, ob in enumerate(sim.scene.objects):
        # settled: inside workspace, no deep interpenetration
        assert -0.16 < ob.t[0] < 0.16 and -0.16 < ob.t[1] < 0.16
        assert ob.t[2] > -0.01
        pts = ob.surface_points(64, np.random.RandomState(0))
        d = sim.scene.sdf(pts, exclude=i, with_table=True)
        assert float(np.min(d)) > -5e-3, "interpenetration after settle"
        # resting: some support within 5 mm below
        drop = sim._support_drop(ob, idx_exclude=i)
        assert drop < 5e-3, f"object {i} floating ({drop:.4f} m)"
    if scene_type == "packed":
        for ob in sim.scene.objects:  # upright placement preserves local z
            np.testing.assert_allclose(ob.R[2, 2], 1.0, atol=1e-5)


def test_descriptor_roundtrip(tmp_path):
    sim = ClutterRemovalSim("pile", rng=np.random.RandomState(5))
    sim.reset(4)
    path = str(tmp_path / "scene.npz")
    sim.save_descriptor(path)
    sim2 = ClutterRemovalSim("pile")
    sim2.reset_from_descriptor(path)
    assert len(sim2.scene) == len(sim.scene)
    for a, b in zip(sim.scene.objects, sim2.scene.objects):
        np.testing.assert_allclose(a.t, b.t, atol=1e-6)
        np.testing.assert_allclose(a.R, b.R, atol=1e-6)
        assert a.kind == b.kind and a.material == b.material


def _top_down_grasp(x, y, z):
    """Grasp pose with approach = world -z, fingers closing along world x."""
    R = np.array([[0.0, 1.0, 0.0],   # x_g = +y_w
                  [1.0, 0.0, 0.0],   # y_g = +x_w  (closing line)
                  [0.0, 0.0, -1.0]], )  # z_g = -z_w (approach down)
    # fix handedness: det must be +1
    R[:, 0] = np.cross(R[:, 1], R[:, 2])
    return Transform(Rotation.from_matrix(R), [x, y, z])


def test_execute_grasp_success_and_failure():
    sim = ClutterRemovalSim("single", rng=np.random.RandomState(0))
    sim.scene = PrimScene([PrimObject(TYPE_CYLINDER, [0.02, 0.04, 0],
                                      t=[0.0, 0.0, 0.04])])
    # good grasp: TCP at the cylinder's axis, approach straight down
    (label, width), remaining = sim.execute_grasp(
        Grasp(_top_down_grasp(0.0, 0.0, 0.05), 0.06), remove=True)
    assert label == Label.SUCCESS
    assert abs(width - 0.04) < 5e-3  # closed to the cylinder diameter
    assert sim.num_objects == 0 and remaining == []

    # empty space: fingers close on nothing
    sim.scene = PrimScene([PrimObject(TYPE_CYLINDER, [0.02, 0.04, 0],
                                      t=[0.0, 0.0, 0.04])])
    (label, _), _ = sim.execute_grasp(
        Grasp(_top_down_grasp(0.1, 0.1, 0.05), 0.06), remove=False)
    assert label == Label.FAILURE

    # colliding pregrasp: TCP below the table
    (label, _), _ = sim.execute_grasp(
        Grasp(_top_down_grasp(0.0, 0.0, -0.02), 0.06), remove=False)
    assert label == Label.FAILURE
    assert sim.num_objects == 1


def test_grasp_too_wide_object_fails():
    sim = ClutterRemovalSim("single", rng=np.random.RandomState(0))
    # 12 cm wide box > 8 cm max opening: approach collides with the top
    sim.scene = PrimScene([PrimObject(TYPE_BOX, [0.06, 0.06, 0.02],
                                      t=[0.0, 0.0, 0.02])])
    (label, _), _ = sim.execute_grasp(
        Grasp(_top_down_grasp(0.0, 0.0, 0.02), 0.08), remove=False)
    assert label == Label.FAILURE


def test_pinned_object_fails():
    sim = ClutterRemovalSim("pile", rng=np.random.RandomState(0))
    sim.scene = PrimScene([
        PrimObject(TYPE_BOX, [0.03, 0.03, 0.015], t=[0.0, 0.0, 0.015]),
        PrimObject(TYPE_BOX, [0.05, 0.05, 0.01], t=[0.0, 0.0, 0.04]),
    ])
    assert sim._pinned_from_above(0)
    assert not sim._pinned_from_above(1)


def test_domain_randomized_render_and_contract(tmp_path):
    from graspnerf_tpu.data.synthetic import hemisphere_poses, intrinsics
    sim = ClutterRemovalSim("pile", rng=np.random.RandomState(11))
    sim.reset(4)
    dr = DomainRandomizer(np.random.RandomState(11)).init_scene(sim.scene)
    poses = hemisphere_poses()
    K = intrinsics(48, 64)
    rgb, depth, fg = render_scene(sim.scene, poses[8], K, 48, 64, dr)
    assert rgb.shape == (48, 64, 3) and rgb.min() >= 0 and rgb.max() <= 1
    assert fg.any() and (depth[fg] > 0).all()
    # deterministic under the same randomizer state
    rgb2, _, _ = render_scene(sim.scene, poses[8], K, 48, 64, dr)
    np.testing.assert_array_equal(rgb, rgb2)

    # file contract: rgb/%04d.png + camera_pose.npy, loadable by the planner
    out = str(tmp_path / "scene0")
    frame_ids = [2, 6, 10]
    render_views_to_dir(sim.scene, poses, K, 48, 64, out, dr,
                        frame_ids=frame_ids, write_depth=True)
    assert sorted(os.listdir(os.path.join(out, "rgb"))) == [
        "0002.png", "0006.png", "0010.png"]
    cams = np.load(os.path.join(out, "camera_pose.npy"))
    assert cams.shape == (24, 4, 4)
    from graspnerf_tpu.detect.planner import load_rendered_views
    images, exts, Ks = load_rendered_views(
        out, os.path.join(out, "camera_pose.npy"),
        frame_ids, wh=(64, 48), K=K)
    assert images.shape == (3, 48, 64, 3)
    np.testing.assert_allclose(exts, poses[frame_ids], atol=1e-4)


def test_update_sceneobj_resync():
    sim = ClutterRemovalSim("pile", rng=np.random.RandomState(2))
    sim.reset(4)
    dr = DomainRandomizer(np.random.RandomState(2)).init_scene(sim.scene)
    n0 = len(dr.materials)
    sim.scene.remove(0)
    dr.update_sceneobj(sim.scene)
    assert len(dr.materials) == len(sim.scene.objects) < n0


def test_acquire_tsdf_shapes():
    sim = ClutterRemovalSim("pile", rng=np.random.RandomState(7))
    sim.reset(3)
    tsdf, tsdf_hi, t_int = sim.acquire_tsdf(n_views=3, resolution=20,
                                            high_resolution=30, h=32, w=40)
    assert tsdf.shape == (20, 20, 20) and tsdf_hi.shape == (30, 30, 30)
    assert np.isfinite(tsdf).all() and t_int >= 0
    # near-surface voxels exist (objects were observed)
    assert (np.abs(tsdf) < 0.5).any()


def test_capsule_surface_points_on_surface():
    """Capsule surface samples must lie on the surface (|sdf| ~ 0) and cover
    both the cylindrical side and the caps area-proportionally."""
    rng = np.random.RandomState(3)
    ob = PrimObject(TYPE_CAPSULE, [0.015, 0.04, 0])
    pts = ob.surface_points(4000, rng)
    d = ob.sdf(pts)
    assert np.abs(d).max() < 1e-4
    # side fraction ~ hz/(hz+r) = 0.04/0.055
    on_side = np.abs(pts[:, 2]) <= 0.04
    frac = on_side.mean()
    assert abs(frac - 0.04 / 0.055) < 0.05
    # caps are populated beyond the cylinder half-length
    assert (np.abs(pts[:, 2]) > 0.041).any()


def test_capsule_radius_bound():
    cap = PrimObject(TYPE_CAPSULE, [0.015, 0.04, 0])
    assert cap.radius_bound == pytest.approx(0.055)
    # the farthest surface point must be inside the bound
    pts = cap.surface_points(2000, np.random.RandomState(0))
    assert np.linalg.norm(pts - cap.t, axis=-1).max() <= cap.radius_bound + 1e-6
    cyl = PrimObject(TYPE_CYLINDER, [0.015, 0.04, 0])
    assert cyl.radius_bound == pytest.approx(np.hypot(0.015, 0.04))


def test_materials_stable_across_removal():
    """Removing any object must not re-shuffle survivors' materials (ADVICE:
    the reference binds Blender materials to object UIDs)."""
    sim = ClutterRemovalSim("pile", rng=np.random.RandomState(2))
    sim.reset(5)
    dr = DomainRandomizer(np.random.RandomState(2)).init_scene(sim.scene)
    survivors = sim.scene.objects[1:]
    before = {id(ob): dr.materials[i + 1]["albedo"].copy()
              for i, ob in enumerate(survivors)}
    sim.scene.remove(0)  # remove a NON-last object
    dr.update_sceneobj(sim.scene)
    assert len(dr.materials) == len(sim.scene.objects)
    for i, ob in enumerate(sim.scene.objects):
        np.testing.assert_array_equal(dr.materials[i]["albedo"],
                                      before[id(ob)])


def test_randomizer_usable_without_init_scene():
    """shade() must not crash on a constructed-but-not-init'd randomizer."""
    dr = DomainRandomizer(np.random.RandomState(0))
    assert 0.0 < dr.ambient < 1.0


def test_contact_abort_closes_at_stopped_pose(monkeypatch):
    """With allow_contact=True, contact mid-approach must close the fingers at
    the aborted TCP pose, not the full target pose (ref simulation.py:369-422
    aborts move_tcp_xyz on contact)."""
    sim = ClutterRemovalSim("single", rng=np.random.RandomState(0))
    # 12 cm wide box: fingers collide with its top during the descent
    sim.scene = PrimScene([PrimObject(TYPE_BOX, [0.06, 0.06, 0.02],
                                      t=[0.0, 0.0, 0.02])])
    seen = {}
    orig = sim._close_fingers

    def spy(pose):
        seen["z"] = float(np.asarray(pose.translation)[2])
        return orig(pose)

    monkeypatch.setattr(sim, "_close_fingers", spy)
    sim.execute_grasp(Grasp(_top_down_grasp(0.0, 0.0, 0.02), 0.08),
                      remove=False, allow_contact=True)
    # stopped well above the 0.02 target (fingertips stop at the box top 0.04)
    assert seen["z"] > 0.03


def test_material_classes_cover_reference_families():
    """All 11 reference material families exist (ref rd/modify_material.py:
    metal/porcelain/plastic/paint/glass/rubber/paper/leather/wood/clay/
    fabric)."""
    from graspnerf_tpu.sim.render import MATERIAL_CLASSES
    assert set(MATERIAL_CLASSES) == {
        "metal", "porcelain", "plastic", "paint", "glass", "rubber",
        "paper", "leather", "wood", "clay", "fabric"}


def test_glass_transmission_and_env(tmp_path):
    """Glass objects transmit the scene behind them (one-bounce Fresnel,
    ref modify_material.py:1490-1598); miss rays see the sky gradient; the
    normal pass writes unit normals (ref rd/render.py:254-332)."""
    from graspnerf_tpu.data.synthetic import hemisphere_poses, intrinsics
    from graspnerf_tpu.sim.render import MATERIAL_CLASSES

    glass_idx = MATERIAL_CLASSES.index("glass")
    metal_idx = MATERIAL_CLASSES.index("metal")

    def build(material):
        sim = ClutterRemovalSim("pile", rng=np.random.RandomState(3))
        sim.scene = PrimScene([
            PrimObject(TYPE_BOX, [0.04, 0.04, 0.05], t=[0.0, 0.0, 0.05],
                       material=material)])
        dr = DomainRandomizer(np.random.RandomState(3)).init_scene(sim.scene)
        return sim, dr

    poses = hemisphere_poses()
    K = intrinsics(48, 64)

    sim_g, dr_g = build(glass_idx)
    assert dr_g.materials[0]["transmit"] > 0.5
    rgb_g, _, fg_g, nm = render_scene(sim_g.scene, poses[8], K, 48, 64, dr_g,
                                      return_normal=True)
    sim_m, dr_m = build(metal_idx)
    assert dr_m.materials[0]["transmit"] == 0.0
    rgb_m, _, fg_m, _ = render_scene(sim_m.scene, poses[8], K, 48, 64, dr_m,
                                     return_normal=True)
    np.testing.assert_array_equal(fg_g, fg_m)  # same geometry
    assert fg_g.any()
    # the glass body renders differently from the opaque one
    diff = np.abs(rgb_g[fg_g] - rgb_m[fg_m]).mean()
    assert diff > 0.02, diff
    assert np.isfinite(rgb_g).all() and rgb_g.min() >= 0 and rgb_g.max() <= 1

    # miss rays: sky gradient, not a constant — variance across the image top
    miss = ~fg_g
    assert rgb_g[miss].std() > 1e-4

    # normal pass: unit normals at hits, zero at misses
    norms = np.linalg.norm(nm[fg_g], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert (np.linalg.norm(nm[~fg_g & (nm != 0).any(-1)], axis=-1) > 0.99).all()

    # render_views_to_dir normal output
    out = str(tmp_path / "np")
    render_views_to_dir(sim_g.scene, poses, K, 48, 64, out, dr_g,
                        frame_ids=[2], write_normal=True)
    nm_f = np.load(os.path.join(out, "normal", "0002.npy"))
    assert nm_f.shape == (48, 64, 3)
