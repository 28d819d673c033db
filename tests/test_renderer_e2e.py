"""End-to-end golden parity: full NeuralRayRenderer + GraspNeRF forward vs the
PyTorch reference on a synthetic scene (converted weights, CPU).

Hierarchical sampling is disabled for the parity run (the reference jitters
fine depths with torch RNG at train and always runs random depth-loss coords at
eval — not reproducible across frameworks); the fine modules themselves are
covered by tests/test_models.py, and a separate smoke test runs the full
hierarchical config through jit.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import graspnerf_tpu.models as M
from ref_harness import load_reference_nr, rand_cameras

H, W = 48, 64
V = 6
RN = 32
BBOX_MIN = np.array([-0.15, -0.15, -0.05], np.float32)

REF_CFG = {
    "init_net_type": "cost_volume",
    "agg_net_type": "neus",
    "use_hierarchical_sampling": False,
    "dist_decoder_cfg": {"use_vis": False},
    "ray_batch_num": 4096,
    "sample_volume": True,
    "render_rgb": True,
    "volume_type": ["sdf"],
    "volume_resolution": 40,
    "depth_sample_num": 40,
    "agg_net_cfg": {"sample_num": 40, "init_s": 0.3, "fix_s": 0},
    "use_ray_mask": True,
    "render_depth": True,
    "use_depth_loss": False,
}


def make_scene(rng):
    import torch
    poses, Ks = rand_cameras(rng, V + 1, H, W, radius=0.5,
                             center=(0.0, 0.0, 0.1))
    imgs = rng.rand(V + 1, H, W, 3).astype(np.float32)
    coords = np.stack([rng.randint(0, W, RN), rng.randint(0, H, RN)],
                      -1).astype(np.float32)[None]  # 1,rn,2 (x,y)
    dr = np.array([[0.2, 0.8]], np.float32)

    ref_t = {
        "imgs": torch.from_numpy(np.moveaxis(imgs[:V], -1, 1)).clone(),
        "poses": torch.from_numpy(poses[:V]).clone(),
        "Ks": torch.from_numpy(Ks[:V]).clone(),
        "depth_range": torch.from_numpy(np.tile(dr, (V, 1))).clone(),
        "bbox3d": [BBOX_MIN.tolist(),
                   (BBOX_MIN + 0.3).tolist()],
    }
    que_t = {
        "imgs": torch.from_numpy(np.moveaxis(imgs[V:], -1, 1)).clone(),
        "coords": torch.from_numpy(coords).clone(),
        "poses": torch.from_numpy(poses[V:]).clone(),
        "Ks": torch.from_numpy(Ks[V:]).clone(),
        "depth_range": torch.from_numpy(dr).clone(),
    }
    data_j = {
        "ref": {"imgs": jnp.asarray(imgs[:V]),
                "poses": jnp.asarray(poses[:V]),
                "Ks": jnp.asarray(Ks[:V]),
                "depth_range": jnp.asarray(np.tile(dr, (V, 1))),
                "bbox3d_min": jnp.asarray(BBOX_MIN)},
        "que": {"imgs": jnp.asarray(imgs[V:]),
                "coords": jnp.asarray(coords),
                "poses": jnp.asarray(poses[V:]),
                "Ks": jnp.asarray(Ks[V:]),
                "depth_range": jnp.asarray(dr)},
    }
    return ref_t, que_t, data_j


@pytest.fixture(scope="module")
def parity_setup():
    rng = np.random.RandomState(3)
    refnr = load_reference_nr()
    import torch
    torch.manual_seed(0)
    tm = refnr.renderer.NeuralRayRenderer(REF_CFG).eval()
    ref_t, que_t, data_j = make_scene(rng)

    fm = M.NeuralRayRenderer(use_hierarchical_sampling=False,
                             use_depth_loss=False)
    variables = fm.init(jax.random.PRNGKey(0), data_j, train=False)
    params, unused = M.convert_state_dict(variables["params"], tm.state_dict())
    assert all("imagenet" in u for u in unused), unused
    return tm, fm, {"params": params}, ref_t, que_t, data_j


def test_full_forward_parity(parity_setup):
    import torch
    tm, fm, variables, ref_t, que_t, data_j = parity_setup
    with torch.no_grad():
        tout = tm({"ref_imgs_info": ref_t, "que_imgs_info": que_t,
                   "eval": True})
    out = jax.jit(lambda v, d: fm.apply(v, d, train=False))(variables, data_j)

    vol_ref = tout["volume"][0, 0].numpy()
    vol = np.asarray(out["volume"])
    np.testing.assert_allclose(vol, vol_ref, atol=2e-3, rtol=1e-2)

    np.testing.assert_allclose(np.asarray(out["pixel_colors_nr"]),
                               tout["pixel_colors_nr"].numpy(),
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out["pixel_colors_gt"]),
                               tout["pixel_colors_gt"].numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["render_depth"]),
                               tout["render_depth"].numpy(),
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_array_equal(np.asarray(out["ray_mask"]),
                                  tout["ray_mask"].numpy())


def test_graspnerf_full_parity(parity_setup, rng):
    import sys
    sys.path.insert(0, "/root/reference/src")
    import torch
    tm, fm, variables, ref_t, que_t, data_j = parity_setup
    from gd.networks import ConvNet
    tvgn = ConvNet().eval()

    gm = M.GraspNeRF(renderer_cfg=dict(use_hierarchical_sampling=False,
                                       use_depth_loss=False))
    idx = rng.randint(0, 40, (5, 3))
    data = dict(data_j, grasp_index=jnp.asarray(idx))
    gvars = gm.init(jax.random.PRNGKey(0), data, train=False)
    sd = {("nr_net." + k): v for k, v in tm.state_dict().items()}
    sd.update({("vgn_net." + k): v for k, v in tvgn.state_dict().items()})
    params, unused = M.convert_state_dict(gvars["params"], sd)
    assert all("imagenet" in u for u in unused), unused

    out = jax.jit(lambda v, d: gm.apply(v, d, train=False))({"params": params},
                                                            data)
    with torch.no_grad():
        tvol = tm({"ref_imgs_info": ref_t, "que_imgs_info": que_t,
                   "eval": True})["volume"]
        tq, tr, tw = tvgn(tvol)
        ti = torch.from_numpy(idx)
        b = torch.arange(1).expand(5)
        tqual = tq[b, :, ti[:, 0], ti[:, 1], ti[:, 2]].squeeze(-1)
        trot = tr[b, :, ti[:, 0], ti[:, 1], ti[:, 2]]
        twidth = tw[b, :, ti[:, 0], ti[:, 1], ti[:, 2]].squeeze(-1)
    qual, rot, width = out["vgn_pred"]
    np.testing.assert_allclose(np.asarray(qual), tqual.numpy(), atol=2e-3,
                               rtol=1e-2)
    np.testing.assert_allclose(np.asarray(rot), trot.numpy(), atol=2e-3,
                               rtol=1e-2)
    np.testing.assert_allclose(np.asarray(width), twidth.numpy(), atol=2e-3,
                               rtol=1e-2)


def test_hierarchical_smoke_jit():
    """Full shipped config (hierarchical + depth loss) compiles and runs."""
    rng = np.random.RandomState(1)
    _, _, data_j = make_scene(rng)
    fm = M.NeuralRayRenderer()
    variables = fm.init(jax.random.PRNGKey(0), data_j, train=True,
                        key=jax.random.PRNGKey(1))
    out = jax.jit(lambda v, d, k: fm.apply(v, d, train=True, key=k))(
        variables, data_j, jax.random.PRNGKey(2))
    assert out["volume"].shape == (40, 40, 40)
    assert out["pixel_colors_nr_fine"].shape == (1, RN, 3)
    assert out["depth_mean"].shape == (V, min(8192, H * W))
    assert np.isfinite(np.asarray(out["volume"])).all()
