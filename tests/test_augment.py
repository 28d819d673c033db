"""Aug parity vs the reference: identical outputs under identical numpy
seeding for depth-range aug, consistent depth range, patch depth offsets,
crop/flip with K adjustment, pad-to-interval, and view selection."""
import numpy as np
import pytest

from ref_harness import load_reference_nr
from graspnerf_tpu.data import augment


@pytest.fixture(scope="module")
def ref_mod():
    load_reference_nr()
    import importlib
    ii = importlib.import_module("utils.imgs_info")
    return ii


def _nchw(x):
    return np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))


def _nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def test_add_depth_offset_parity():
    # extract the function by AST: importing dataset.train_dataset would
    # eagerly load asset CSVs that don't exist here
    from ref_harness import load_reference_function
    ref_fn = load_reference_function("src/nr/dataset/train_dataset.py",
                                     "add_depth_offset")
    rng = np.random.RandomState(0)
    depth = rng.uniform(0.2, 0.8, (48, 64)).astype(np.float32)
    mask = np.zeros((48, 64), bool)
    mask[10:40, 15:55] = True
    d_ref = depth.copy()
    np.random.seed(123)
    ref_fn(d_ref, mask, 0.05, 0.1, 0.5, 1.0, 0.1, 0.6)
    d_ours = depth.copy()
    np.random.seed(123)
    augment.add_depth_offset(d_ours, mask, 0.05, 0.1, 0.5, 1.0, 0.1, 0.6)
    np.testing.assert_allclose(d_ours, d_ref, atol=1e-6)


def test_consistent_depth_range_parity():
    """Margin variant (live: use_consistent_min_max False) — pure math, no
    RNG. Compare against the reference formula re-derived on random ranges."""
    rng = np.random.RandomState(1)
    ref_dr = np.stack([rng.uniform(0.1, 0.3, 6),
                       rng.uniform(0.5, 1.0, 6)], -1).astype(np.float32)
    que_dr = np.array([[0.2, 0.9]], np.float32)
    out_ref, out_que = augment.consistent_depth_range(ref_dr, que_dr)
    # reference semantics (train_dataset.py:320-334)
    dr = np.concatenate([ref_dr, que_dr], 0)
    length = dr[:, 1] - dr[:, 0]
    max_len = length.max()
    near = np.maximum(dr[:, 0] - (max_len - length) / 2, dr[:, 0] * 0.5)
    exp = np.stack([near, near + max_len], -1)
    np.testing.assert_allclose(np.concatenate([out_ref, out_que]), exp,
                               atol=1e-6)
    # all views end with the same range length
    lens = np.concatenate([out_ref, out_que])
    np.testing.assert_allclose(lens[:, 1] - lens[:, 0], max_len, atol=1e-6)


def test_random_change_depth_range_stats():
    """5% fire rate, near shrinks, far extends (ref :271-279 defaults)."""
    rng = np.random.RandomState(2)
    dr = np.array([[0.2, 0.8]] * 7, np.float32)
    fired = 0
    for _ in range(2000):
        out = augment.random_change_depth_range(dr, rng)
        if not np.allclose(out, dr):
            fired += 1
            assert (out[:, 0] <= dr[:, 0] + 1e-7).all()
            assert (out[:, 1] >= dr[:, 1] - 1e-7).all()
            assert (out[:, 0] >= dr[:, 0] * 0.95 - 1e-7).all()
            assert (out[:, 1] <= dr[:, 1] * 1.05 + 1e-7).all()
    assert 60 <= fired <= 140  # ~5% of 2000


def test_random_crop_parity(ref_mod):
    rng = np.random.RandomState(3)
    imgs = rng.rand(2, 40, 60, 3).astype(np.float32)
    depth = rng.rand(2, 40, 60, 1).astype(np.float32)
    Ks = np.tile(np.array([[50.0, 0, 30], [0, 50, 20], [0, 0, 1]],
                          np.float32), (2, 1, 1))
    ref_info = {"imgs": _nchw(imgs), "depth": _nchw(depth),
                "Ks": Ks.copy()}
    que_info = {"imgs": _nchw(imgs.copy()), "Ks": Ks.copy()}
    np.random.seed(7)
    r_ref, _ = ref_mod.random_crop(ref_info, que_info, (24, 32))
    ours = {"imgs": imgs, "depth": depth, "Ks": Ks.copy()}
    np.random.seed(7)
    o = augment.random_crop(ours, (24, 32))
    np.testing.assert_allclose(o["imgs"], _nhwc(r_ref["imgs"]), atol=1e-6)
    np.testing.assert_allclose(o["depth"], _nhwc(r_ref["depth"]), atol=1e-6)
    np.testing.assert_allclose(o["Ks"], r_ref["Ks"], atol=1e-6)


def test_random_flip_parity(ref_mod):
    rng = np.random.RandomState(4)
    imgs = rng.rand(2, 16, 24, 3).astype(np.float32)
    Ks = np.tile(np.array([[50.0, 0, 11], [0, 50, 7], [0, 0, 1]],
                          np.float32), (2, 1, 1))
    ref_info = {"imgs": _nchw(imgs), "Ks": Ks.copy()}
    que_info = {"imgs": _nchw(imgs.copy()), "Ks": Ks.copy()}
    r_ref, _ = ref_mod.random_flip(ref_info, que_info)
    o = augment.random_flip({"imgs": imgs, "Ks": Ks.copy()})
    np.testing.assert_allclose(o["imgs"], _nhwc(r_ref["imgs"]), atol=1e-6)
    np.testing.assert_allclose(o["Ks"], r_ref["Ks"], atol=1e-6)
    # the adjusted K maps a pixel to its mirrored column
    x = np.array([3.0, 5.0, 1.0])
    fx = o["Ks"][0] @ x
    ox = Ks[0] @ x
    assert fx[0] / fx[2] == pytest.approx(24 - 1 - ox[0] / ox[2])


def test_pad_imgs_parity(ref_mod):
    rng = np.random.RandomState(5)
    imgs = rng.rand(2, 30, 45, 3).astype(np.float32)
    depth = rng.rand(2, 30, 45, 1).astype(np.float32)
    masks = (rng.rand(2, 30, 45, 1) > 0.5).astype(np.float32)
    ref_info = {"imgs": _nchw(imgs), "depth": _nchw(depth),
                "masks": _nchw(masks), "true_depth": _nchw(depth.copy())}
    r_ref = ref_mod.pad_imgs_info(ref_info, 16)
    o = augment.pad_imgs_to_interval(
        {"imgs": imgs, "depth": depth, "masks": masks,
         "true_depth": depth.copy()}, 16)
    assert o["imgs"].shape == (2, 32, 48, 3)
    np.testing.assert_allclose(o["imgs"], _nhwc(r_ref["imgs"]), atol=1e-6)
    np.testing.assert_allclose(o["depth"], _nhwc(r_ref["depth"]), atol=1e-6)
    np.testing.assert_allclose(o["true_depth"], _nhwc(r_ref["true_depth"]),
                               atol=1e-6)


def test_get_ref_que_ids_semantics():
    """6 equally-spaced of 24, que at offset 1..3 from a reference view
    (ref :204-209)."""
    rng = np.random.RandomState(6)
    for _ in range(100):
        ids, que = augment.get_ref_que_ids(rng, 24, 6)
        assert len(ids) == 6 and len(set(ids)) == 6
        gaps = {(ids[(i + 1) % 6] - ids[i]) % 24 for i in range(6)}
        assert gaps == {4}
        assert que not in ids
        assert min((que - i) % 24 for i in ids) in (1, 2, 3)
