"""Scene batching: vmap over the scene axis matches single-scene results
(BASELINE config 2 — batched rendering / volume extraction)."""
import jax
import jax.numpy as jnp
import numpy as np

from graspnerf_tpu.models import NeuralRayRenderer
from graspnerf_tpu.data import SyntheticSceneDataset


def test_vmap_scene_batching_matches_single():
    ds = SyntheticSceneDataset(h=32, w=32, n_rays=16, seed=0, fuse_views=6,
                               resolution=16)
    b1, b2 = ds.sample(), ds.sample()
    refs = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        b1["data"]["ref"], b2["data"]["ref"])
    r = NeuralRayRenderer(render_rgb=False, use_depth_loss=False,
                          volume_resolution=16)
    v = r.init(jax.random.PRNGKey(0),
               {"ref": jax.tree_util.tree_map(lambda x: x[0], refs)},
               train=False)
    batched = jax.jit(jax.vmap(
        lambda ref: r.apply(v, {"ref": ref}, train=False)["volume"]))
    vols = batched(refs)
    assert vols.shape == (2, 16, 16, 16)
    single = jax.jit(
        lambda ref: r.apply(v, {"ref": ref}, train=False)["volume"])
    for i in range(2):
        vi = single(jax.tree_util.tree_map(lambda x, i=i: x[i], refs))
        np.testing.assert_allclose(np.asarray(vols[i]), np.asarray(vi),
                                   atol=1e-4, rtol=1e-4)
