"""Golden parity: flax model modules vs the PyTorch reference (CPU, converted
weights). Reference modules are built randomly initialised; weights are
converted with models.convert and outputs compared allclose."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import graspnerf_tpu.models as M
from ref_harness import load_reference_nr

ATOL = 3e-4
RTOL = 1e-3


def to_nchw(x):
    return np.moveaxis(x, -1, 1)


def to_nhwc(x):
    return np.moveaxis(x, 1, -1)


def convert(module, torch_module, *args, prefix="", **kw):
    import torch
    variables = module.init(jax.random.PRNGKey(0), *args, **kw)
    params, unused = M.convert_state_dict(
        variables["params"], torch_module.state_dict(), prefix=prefix)
    return {"params": params}, unused


@pytest.fixture(scope="module")
def refnr():
    return load_reference_nr()


def test_resunet_light_parity(refnr, rng):
    import torch
    tm = refnr.ops.ResUNetLight(3, [1, 2, 6, 4], 32, inplanes=16).eval()
    x = rng.rand(2, 32, 48, 3).astype(np.float32)
    fm = M.ResUNetLight((1, 2, 6, 4), 32, 16)
    variables, unused = convert(fm, tm, jnp.asarray(x))
    assert unused == []
    out = fm.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(to_nchw(x))).numpy()
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=ATOL, rtol=RTOL)


def test_init_net_and_vis_encoder_parity(refnr, rng):
    import torch
    import network.init_net as ref_init
    import network.vis_encoder as ref_vis
    tm = ref_init.CostVolumeInitNet({}).eval()
    x = rng.rand(2, 32, 48, 3).astype(np.float32)
    fm = M.RayFeatInitNet()
    variables, unused = convert(fm, tm, jnp.asarray(x))
    assert all(u.startswith("imagenet") for u in unused)  # dead buffers
    ray = fm.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref_ray = tm({"imgs": torch.from_numpy(to_nchw(x))}, None, False).numpy()
    np.testing.assert_allclose(np.asarray(ray), to_nhwc(ref_ray), atol=ATOL, rtol=RTOL)

    tv = ref_vis.DefaultVisEncoder({}).eval()
    imgf = rng.rand(2, 8, 12, 32).astype(np.float32)
    fv = M.VisEncoder()
    variables, unused = convert(fv, tv, jnp.asarray(ray), jnp.asarray(imgf))
    assert unused == []
    out = fv.apply(variables, jnp.asarray(ray), jnp.asarray(imgf))
    with torch.no_grad():
        ref_out = tv(torch.from_numpy(to_nchw(np.asarray(ray))),
                     torch.from_numpy(to_nchw(imgf))).numpy()
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref_out), atol=ATOL, rtol=RTOL)


def test_dist_decoder_parity(refnr, rng):
    import torch
    tm = refnr.dist_decoder.MixtureLogisticsDistDecoder({"use_vis": False}).eval()
    feats = rng.rand(6, 1, 7, 5, 32).astype(np.float32)
    fm = M.MixtureLogisticsDistDecoder(use_vis=False)
    variables, unused = convert(fm, tm, jnp.asarray(feats))
    assert unused == []
    mean, var, vis, aw = fm.apply(variables, jnp.asarray(feats))
    with torch.no_grad():
        tmean, tvar, tvis, taw = tm(torch.from_numpy(feats))
    np.testing.assert_allclose(np.asarray(mean), tmean.numpy(), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(var), tvar.numpy(), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(aw), taw.numpy(), atol=ATOL, rtol=RTOL)

    # compute_prob parity (per-ref-view interval bounds)
    depth = (rng.rand(6, 1, 7, 5).astype(np.float32) * 0.6 + 0.2)
    interval = (rng.rand(1, 1, 7, 5).astype(np.float32) * 0.02 + 0.01)
    depth_range = np.tile(np.array([[0.2, 0.8]], np.float32), (6, 1))
    a, v, h = M.compute_prob(jnp.asarray(depth), jnp.asarray(interval),
                             mean, var, vis, aw, jnp.asarray(depth_range))
    with torch.no_grad():
        ta, tv_, th = tm.compute_prob(
            torch.from_numpy(depth), torch.from_numpy(interval), tmean, tvar,
            tvis, taw, True, torch.from_numpy(depth_range))
    np.testing.assert_allclose(np.asarray(a), ta.numpy(), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(v), tv_.numpy(), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(h), th.numpy(), atol=ATOL, rtol=RTOL)


def _rand_agg_inputs(rng, R=6, D=40, V=6):
    rgb_feat = rng.rand(R, D, V, 35).astype(np.float32)
    neuray = rng.rand(R, D, V, 32).astype(np.float32)
    ray_diff = (rng.rand(R, D, V, 4).astype(np.float32) - 0.5)
    mask = (rng.rand(R, D, V, 1) > 0.2).astype(np.float32)
    pts = (rng.rand(1, R, D, 3).astype(np.float32) - 0.5) * 0.4
    return rgb_feat, neuray, ray_diff, mask, pts


def test_ibrnet_neus_parity(refnr, rng):
    import torch
    R, D, V = 6, 40, 6
    rgb_feat, neuray, ray_diff, mask, pts = _rand_agg_inputs(rng, R, D, V)
    tm = refnr.ibrnet.IBRNetWithNeuRayNeus(32, n_samples=D).eval()
    fm = M.IBRNetNeus()
    # new interface: views-leading [V, R*D, C] + (R, D)
    vnc = lambda a: jnp.asarray(
        a.transpose(2, 0, 1, 3).reshape(V, R * D, a.shape[-1]))
    args = (vnc(rgb_feat), vnc(neuray), vnc(ray_diff), vnc(mask),
            jnp.asarray(pts), (R, D))
    variables, unused = convert(fm, tm, *args)
    assert unused == []
    rgb, sdf, grad = fm.apply(variables, *args)

    tpts = torch.from_numpy(pts)
    tout, tgrad = tm(torch.from_numpy(rgb_feat), torch.from_numpy(neuray),
                     torch.from_numpy(ray_diff), torch.from_numpy(mask), tpts)
    np.testing.assert_allclose(np.asarray(rgb), tout[..., :3].detach().numpy(),
                               atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(sdf), tout[..., 3:].detach().numpy(),
                               atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(grad), tgrad.detach().numpy(),
                               atol=3e-3, rtol=1e-2)


def test_neus_aggregation_parity(refnr, rng):
    import torch
    import network.aggregate_net as ref_agg
    V, qn, rn, dn = 6, 1, 6, 40
    prj = {
        "ray_feats": rng.rand(V, qn, rn, dn, 32).astype(np.float32),
        "hit_prob": rng.rand(V, qn, rn, dn, 1).astype(np.float32),
        "vis": rng.rand(V, qn, rn, dn, 1).astype(np.float32),
        "rgb": rng.rand(V, qn, rn, dn, 3).astype(np.float32),
        "dir": rng.rand(V, qn, rn, dn, 3).astype(np.float32),
        "mask": (rng.rand(V, qn, rn, dn, 1) > 0.2).astype(np.float32),
        "img_feats": rng.rand(V, qn, rn, dn, 32).astype(np.float32),
    }
    que_dir = rng.rand(qn, rn, dn, 3).astype(np.float32)
    que_dir /= np.linalg.norm(que_dir, axis=-1, keepdims=True)
    que_pts = (rng.rand(qn, rn, dn, 3).astype(np.float32) - 0.5) * 0.4
    que_dists = rng.rand(qn, rn, dn).astype(np.float32) * 0.02

    tm = ref_agg.NeusAggregationNet(
        {"sample_num": dn, "init_s": 0.3, "fix_s": 0}).eval()
    fm = M.NeusAggregationNet()
    jprj = {k: jnp.asarray(v) for k, v in prj.items()}
    variables, unused = convert(fm, tm, jprj, jnp.asarray(que_dir),
                                jnp.asarray(que_pts), jnp.asarray(que_dists))
    assert unused == []
    out = fm.apply(variables, jprj, jnp.asarray(que_dir), jnp.asarray(que_pts),
                   jnp.asarray(que_dists))

    tprj = {k: torch.from_numpy(v) for k, v in prj.items()}
    talpha, tsdf, tcolors, tgerr, ts = tm(
        tprj, torch.from_numpy(que_dir), torch.from_numpy(que_pts),
        torch.from_numpy(que_dists), False)
    np.testing.assert_allclose(np.asarray(out["sdf"]), tsdf.detach().numpy(),
                               atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(out["colors"]), tcolors.detach().numpy(),
                               atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(out["alpha"]), talpha.detach().numpy(),
                               atol=1e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out["grad_error"]),
                               tgerr.detach().numpy(), atol=1e-3, rtol=1e-2)


def test_vgn_convnet_parity(rng):
    import sys
    sys.path.insert(0, "/root/reference/src")
    import torch
    from gd.networks import ConvNet
    tm = ConvNet().eval()
    vol = (rng.rand(1, 40, 40, 40, 1).astype(np.float32) - 0.5) * 2
    fm = M.VGNConvNet()
    variables, unused = convert(fm, tm, jnp.asarray(vol))
    assert unused == []
    qual, rot, width = fm.apply(variables, jnp.asarray(vol))
    with torch.no_grad():
        tq, tr, tw = tm(torch.from_numpy(np.moveaxis(vol, -1, 1)))
    np.testing.assert_allclose(np.asarray(qual)[..., 0], tq.numpy()[:, 0],
                               atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.moveaxis(np.asarray(rot), -1, 1), tr.numpy(),
                               atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(width)[..., 0], tw.numpy()[:, 0],
                               atol=ATOL, rtol=RTOL)
