"""convert_checkpoint.py CLI round trip: synthetic torch model_best.pth ->
CLI -> Orbax -> planner load -> volume inference.

Covers the full deployment path for reference checkpoints (ref main.py:152-157
loads model_best.pth; here the converted artifact must load through the SAME
code path as trainer checkpoints — load_checkpoint_params)."""
import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ref_harness import load_reference_nr, rand_cameras
from test_renderer_e2e import REF_CFG

from graspnerf_tpu import models as M


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    import torch
    root = tmp_path_factory.mktemp("ckpt")
    refnr = load_reference_nr()
    sys.path.insert(0, "/root/reference/src")
    from gd.networks import ConvNet

    torch.manual_seed(0)
    # hierarchical ON to match the converter's default GraspNeRF tree
    cfg = dict(REF_CFG, use_hierarchical_sampling=True)
    tm = refnr.renderer.NeuralRayRenderer(cfg).eval()
    tvgn = ConvNet().eval()
    sd = {("nr_net." + k): v for k, v in tm.state_dict().items()}
    sd.update({("vgn_net." + k): v for k, v in tvgn.state_dict().items()})
    pth = root / "model_best.pth"
    torch.save({"network_state_dict": sd, "step": 123,
                "optimizer_state_dict": {}}, pth)

    out_dir = root / "converted"
    out = subprocess.run(
        [sys.executable, "scripts/convert_checkpoint.py", str(pth),
         str(out_dir), "--cpu"],
        capture_output=True, text=True, timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    return sd, out_dir


def test_cli_roundtrip_params_exact(converted):
    """CLI-written Orbax params == in-process conversion, bit-exact."""
    sd, out_dir = converted
    from graspnerf_tpu.detect.planner import load_checkpoint_params
    params = load_checkpoint_params(str(out_dir / "params"))

    from graspnerf_tpu.data import SyntheticSceneDataset
    ds = SyntheticSceneDataset(h=64, w=64, n_rays=32, seed=0, fuse_views=6)
    batch = jax.tree_util.tree_map(jnp.asarray, ds.sample())
    model = M.GraspNeRF(renderer_cfg={})
    variables = model.init(jax.random.PRNGKey(0), batch["data"], train=True,
                           key=jax.random.PRNGKey(1))
    expect, _ = M.convert_state_dict(variables["params"], sd)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(expect))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))


def test_planner_runs_on_converted_checkpoint(converted):
    """Converted params drive GraspNeRFPlanner.core end-to-end."""
    _, out_dir = converted
    from graspnerf_tpu.detect.planner import (GraspNeRFPlanner,
                                              load_checkpoint_params)
    params = load_checkpoint_params(str(out_dir / "params"))
    planner = GraspNeRFPlanner(params,
                               renderer_cfg={"volume_resolution": 16})
    rng = np.random.RandomState(0)
    poses, Ks = rand_cameras(rng, 6, 64, 64, radius=0.5,
                             center=(0.0, 0.0, 0.1))
    imgs = rng.rand(6, 64, 64, 3).astype(np.float32)
    dr = np.tile(np.array([[0.2, 0.8]], np.float32), (6, 1))
    vol, cand, dt = planner.core(imgs, poses, Ks, dr)
    assert vol.shape == (16, 16, 16)
    assert np.isfinite(np.asarray(vol)).all()
    assert np.isfinite(np.asarray(cand.scores)).all()
