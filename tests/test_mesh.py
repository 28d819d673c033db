"""Mesh extraction: the iso-surface of an analytic sphere SDF must lie on the
sphere, and the PLY writer must round-trip."""
import numpy as np

from graspnerf_tpu.ops.mesh import (marching_tetrahedra, dedupe_mesh,
                                    save_ply, volume_to_mesh, gripper_lines)


def _sphere_sdf(res=32, r=0.3):
    ax = np.linspace(-1, 1, res)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    return np.linalg.norm(g, axis=-1) - r, ax


def test_marching_tetrahedra_sphere():
    sdf, ax = _sphere_sdf()
    verts, faces = marching_tetrahedra(sdf, 0.0)
    assert len(verts) > 100 and len(faces) > 100
    # map index coords back to [-1,1]
    scale = ax[1] - ax[0]
    pts = verts * scale - 1.0
    radii = np.linalg.norm(pts, axis=-1)
    assert np.abs(radii - 0.3).max() < 2.5 * scale
    assert np.abs(radii - 0.3).mean() < 0.5 * scale

    dv, df = dedupe_mesh(verts, faces)
    assert len(dv) < len(verts)
    assert df.max() < len(dv)


def test_ply_roundtrip(tmp_path):
    sdf, _ = _sphere_sdf(16)
    verts, faces = volume_to_mesh(sdf, voxel_size=1.0)
    p = tmp_path / "m.ply"
    save_ply(str(p), verts, faces)
    txt = p.read_text().splitlines()
    assert txt[0] == "ply"
    n_v = int([l for l in txt if l.startswith("element vertex")][0].split()[-1])
    n_f = int([l for l in txt if l.startswith("element face")][0].split()[-1])
    assert n_v == len(verts) and n_f == len(faces)


def test_gripper_lines_rigid():
    T = np.eye(4)
    T[:3, 3] = [1, 2, 3]
    segs = gripper_lines(T, width=0.08)
    assert segs.shape == (4, 2, 3)
    # palm bar length == width
    palm = segs[1]
    assert np.isclose(np.linalg.norm(palm[1] - palm[0]), 0.08)
    assert np.allclose(segs.mean((0, 1))[:2], [1, 2], atol=0.1)
