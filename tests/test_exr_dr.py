"""EXR I/O + round-5 DR fidelity features (image env maps, image textures,
IR stereo pass) — ref rd/render.py:20-110,254-332, render_utils.py:552-596,
dataset/database.py:129-198."""
import struct
import zlib

import numpy as np
import pytest


# ------------------------------------------------------------------- EXR
def test_exr_float_roundtrip(tmp_path):
    from graspnerf_tpu.data.exr import write_exr, read_exr
    d = np.random.RandomState(0).rand(17, 23).astype(np.float32)
    p = str(tmp_path / "d.exr")
    write_exr(p, d)
    np.testing.assert_array_equal(read_exr(p), d)


def test_exr_rgb_half_roundtrip(tmp_path):
    from graspnerf_tpu.data.exr import write_exr, read_exr
    c = np.random.RandomState(1).rand(9, 11, 3).astype(np.float32)
    p = str(tmp_path / "c.exr")
    write_exr(p, c, half=True)
    r = read_exr(p)
    assert r.shape == (9, 11, 3)
    np.testing.assert_allclose(r, c, atol=5e-4)  # half precision


def test_exr_reads_zips_compression(tmp_path):
    """Files ZIPS-compressed by a standard writer (Blender default family)
    decode bit-exactly: predictor + interleave + deflate."""
    import graspnerf_tpu.data.exr as E
    rng = np.random.RandomState(2)
    dat = rng.rand(5, 7).astype(np.float32)
    H, W = dat.shape

    def predict_compress(line):
        b = np.frombuffer(line, np.uint8)
        n = len(b)
        half = (n + 1) // 2
        inter = np.empty(n, np.uint8)
        inter[:half] = b[0::2]
        inter[half:] = b[1::2]
        d = inter.astype(np.int64)
        out = d.copy()
        out[1:] = (d[1:] - d[:-1] + 128) % 256
        return zlib.compress(out.astype(np.uint8).tobytes())

    chlist = (b"Y\0" + struct.pack("<i", 2) + b"\0\0\0\0"
              + struct.pack("<ii", 1, 1) + b"\0")
    box = struct.pack("<iiii", 0, 0, W - 1, H - 1)
    header = b"".join([
        E._attr(b"channels", b"chlist", chlist),
        E._attr(b"compression", b"compression", bytes([2])),  # ZIPS
        E._attr(b"dataWindow", b"box2i", box),
        E._attr(b"displayWindow", b"box2i", box),
        E._attr(b"lineOrder", b"lineOrder", b"\0"),
        E._attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0)),
        E._attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0)),
        E._attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0)),
    ]) + b"\0"
    chunks = [struct.pack("<ii", y, len(c)) + c
              for y, c in ((y, predict_compress(dat[y].tobytes()))
                           for y in range(H))]
    pre = len(E._MAGIC) + 4 + len(header) + 8 * H
    offs, pos = [], pre
    for ch in chunks:
        offs.append(pos)
        pos += len(ch)
    p = tmp_path / "z.exr"
    p.write_bytes(E._MAGIC + struct.pack("<i", 2) + header
                  + struct.pack("<%dQ" % H, *offs) + b"".join(chunks))
    np.testing.assert_array_equal(E.read_exr(str(p)), dat)


def test_database_reads_exr_depth(tmp_path):
    from graspnerf_tpu.data.exr import write_exr
    from graspnerf_tpu.data.database import VGNSynDatabase
    d = tmp_path / "scene"
    (d / "depth").mkdir(parents=True)
    (d / "rgb").mkdir()
    depth = np.random.RandomState(3).rand(36, 64).astype(np.float32) + 0.2
    write_exr(str(d / "depth" / "0000.exr"), depth)
    np.save(d / "camera_pose.npy",
            np.tile(np.eye(4, dtype=np.float32)[None], (24, 1, 1)))
    db = VGNSynDatabase(str(d), scale=0.1)
    np.testing.assert_allclose(db.get_depth(0), depth, rtol=1e-6)


# ------------------------------------------------------------ DR fidelity
@pytest.fixture(scope="module")
def pile_sim():
    from graspnerf_tpu.sim.simulation import ClutterRemovalSim
    sim = ClutterRemovalSim("pile", rng=np.random.RandomState(0))
    sim.reset(4)
    return sim


def test_envmap_bilinear_wraps():
    from graspnerf_tpu.sim.render import EnvMap
    img = np.zeros((8, 16, 3), np.float32)
    img[:, 0] = [1, 0, 0]
    img[:, -1] = [0, 1, 0]
    em = EnvMap(img)
    # direction exactly between the wrap seam (az = pi) mixes last&first col
    c = em.sample(np.array([[-1.0, 1e-5, 0.0]]))
    assert c[0, 0] > 0.1 and c[0, 1] > 0.1
    # zenith stays finite
    assert np.isfinite(em.sample(np.array([[0.0, 0.0, 1.0]]))).all()


def test_dr_uses_image_env_and_textures(pile_sim):
    from graspnerf_tpu.sim.render import (DomainRandomizer, render_scene,
                                          load_env_bank, load_texture_bank)
    assert len(load_env_bank()) >= 4       # committed equirect set
    assert len(load_texture_bank()) >= 6   # committed texture set
    got_env = got_tex = False
    from graspnerf_tpu.data.synthetic import hemisphere_poses, intrinsics
    poses, K = hemisphere_poses(), intrinsics(36, 64)
    for seed in range(10):
        dr = DomainRandomizer(np.random.RandomState(seed))
        dr.init_scene(pile_sim.scene)
        got_env |= dr.env_map is not None
        got_tex |= (any(m.get("tex_img") is not None for m in dr.materials)
                    or dr.floor.get("tex_img") is not None)
        rgb, depth, fg = render_scene(pile_sim.scene, poses[2], K, 36, 64, dr)
        assert np.isfinite(rgb).all() and rgb.max() <= 1.0
    assert got_env and got_tex


def test_ir_stereo_pass(pile_sim):
    from graspnerf_tpu.sim.render import DomainRandomizer, render_ir_stereo
    from graspnerf_tpu.data.synthetic import hemisphere_poses, intrinsics
    dr = DomainRandomizer(np.random.RandomState(4))
    dr.init_scene(pile_sim.scene)
    poses, K = hemisphere_poses(), intrinsics(48, 64)
    irl, irr = render_ir_stereo(pile_sim.scene, poses[2], K, 48, 64, dr)
    assert irl.shape == irr.shape == (48, 64)
    assert np.isfinite(irl).all() and 0 <= irl.min() and irl.max() <= 1.0
    # a real stereo baseline: the two views differ
    assert np.abs(irl - irr).mean() > 1e-3
    # speckle dots present: intensity is strongly bimodal on foreground
    assert (irl > 0.25).mean() > 0.005


def test_render_views_to_dir_exr_ir(tmp_path, pile_sim):
    from graspnerf_tpu.sim.render import (DomainRandomizer,
                                          render_views_to_dir)
    from graspnerf_tpu.data.exr import read_exr
    from graspnerf_tpu.data.synthetic import hemisphere_poses, intrinsics
    dr = DomainRandomizer(np.random.RandomState(5))
    dr.init_scene(pile_sim.scene)
    poses, K = hemisphere_poses(), intrinsics(36, 48)
    out = render_views_to_dir(pile_sim.scene, poses, K, 36, 48,
                              str(tmp_path), dr, frame_ids=[2],
                              write_depth=True, write_mask=True,
                              write_ir=True)
    depth = read_exr(str(tmp_path / "depth" / "0002.exr"))
    assert depth.shape == (36, 48) and (depth > 0).any()
    mask = read_exr(str(tmp_path / "mask" / "0002.exr"))
    assert set(np.unique(mask)) <= {0.0, 1.0}
    assert (tmp_path / "ir_l" / "0002.png").exists()
    assert (tmp_path / "ir_r" / "0002.png").exists()
