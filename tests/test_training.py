"""Training-loop tests: step runs and learns, LR schedule parity, checkpoint
latest/best semantics, and SPMD sharded-vs-single-device equivalence on the
8-device virtual CPU mesh."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from graspnerf_tpu.models import GraspNeRF
from graspnerf_tpu.data import SyntheticSceneDataset
from graspnerf_tpu.train import (create_train_state, make_train_step,
                                 exp_decay_lr, CheckpointManager)
from graspnerf_tpu.parallel import make_mesh, SPACE_AXIS

CFG = dict(volume_resolution=16, use_hierarchical_sampling=False)


def tiny_batch(seed=0, n_rays=32):
    ds = SyntheticSceneDataset(h=32, w=32, n_rays=n_rays, n_grasps=8,
                               seed=seed, fuse_views=6, resolution=16)
    return jax.tree_util.tree_map(jnp.asarray, ds.sample())


@pytest.fixture(scope="module")
def model_and_state():
    model = GraspNeRF(renderer_cfg=dict(CFG))
    batch = tiny_batch()
    state = create_train_state(model, batch, jax.random.PRNGKey(0))
    return model, state, batch


def test_train_step_learns(model_and_state):
    model, state, batch = model_and_state
    # the step donates its input state; work on a copy so the module-scoped
    # fixture's buffers stay alive for the other tests
    state = jax.tree_util.tree_map(jnp.copy, state)
    step = make_train_step(model)
    first = None
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        total = float(metrics["total"])
        assert np.isfinite(total)
        if first is None:
            first = total
    assert total < first, (first, total)


def test_nonfinite_grad_skips_update(model_and_state):
    """A batch that produces non-finite gradients must leave params and opt
    state untouched and set the nonfinite_grad metric, instead of poisoning
    the parameters (the r4 full-scale run NaN'd every param silently)."""
    model, state, batch = model_and_state
    state = jax.tree_util.tree_map(jnp.copy, state)
    step = make_train_step(model)
    bad = jax.tree_util.tree_map(jnp.copy, batch)
    bad["data"]["ref"]["imgs"] = bad["data"]["ref"]["imgs"] * jnp.nan
    params_before = jax.tree_util.tree_map(np.asarray, state.params)
    state2, metrics = step(state, bad, jax.random.PRNGKey(0))
    assert float(metrics["nonfinite_grad"]) == 1.0
    after = jax.tree_util.tree_map(np.asarray, state2.params)
    jax.tree_util.tree_map(np.testing.assert_array_equal, params_before,
                           after)
    # and a good batch still trains (guard lets finite steps through)
    state3, metrics = step(state2, jax.tree_util.tree_map(jnp.copy, batch),
                           jax.random.PRNGKey(1))
    assert float(metrics["nonfinite_grad"]) == 0.0
    changed = jax.tree_util.tree_reduce(
        lambda a, b: a or b,
        jax.tree_util.tree_map(
            lambda x, y: bool(np.any(np.asarray(x) != np.asarray(y))),
            after, jax.tree_util.tree_map(np.asarray, state3.params)))
    assert changed


def test_exp_decay_lr():
    s = exp_decay_lr(1e-4, 100_000, 0.5, 1e-5)
    assert float(s(0)) == pytest.approx(1e-4)
    assert float(s(100_000)) == pytest.approx(5e-5)
    assert float(s(400_000)) == pytest.approx(1e-5)  # floor (would be 6.25e-6)


def test_checkpoint_latest_best(tmp_path, model_and_state):
    _, state, _ = model_and_state
    tree = {"params": state.params, "opt_state": state.opt_state}
    cm = CheckpointManager(str(tmp_path / "ckpt"))
    best = cm.save(tree, step=1, key_metric=0.5)
    assert best == 0.5
    best = cm.save(tree, step=2, key_metric=0.7, best=best)  # worse → no promote
    assert best == 0.5
    best = cm.save(tree, step=3, key_metric=0.3, best=best)  # better → promote
    assert best == 0.3

    restored = cm.restore(tree)
    assert restored is not None
    r_tree, step, r_best = restored
    assert step == 3 and r_best == 0.3
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        tree["params"], r_tree["params"])


def test_sharded_matches_single_device(model_and_state):
    """One SPMD train step on the (1, 8) mesh must match the single-device
    step numerically (same params, same batch, same rng)."""
    model, state0, batch = model_and_state
    single = make_train_step(model)
    s1, m1 = single(
        jax.tree_util.tree_map(jnp.copy, state0), batch, jax.random.PRNGKey(7))

    mesh = make_mesh()
    sharded_model = GraspNeRF(renderer_cfg=dict(CFG, space_axis=SPACE_AXIS))
    with jax.set_mesh(mesh):
        rep = NamedSharding(mesh, P())
        state = jax.device_put(jax.tree_util.tree_map(jnp.copy, state0), rep)
        b = jax.device_put(batch, rep)
        b["data"]["que"]["coords"] = jax.device_put(
            batch["data"]["que"]["coords"], NamedSharding(mesh, P(None, SPACE_AXIS)))
        step = make_train_step(sharded_model, out_sharding=rep)
        s2, m2 = step(state, b, jax.random.PRNGKey(7))
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-3,
                                   atol=2e-4, err_msg=k)
    # parameters after the update agree too
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 2e-4


def test_checkpoint_crash_safe(tmp_path, model_and_state):
    """A crash mid-save must never lose the previous checkpoint: saves go to
    fresh step dirs and latest/best are atomic symlink swaps."""
    import os
    _, state, _ = model_and_state
    tree = {"params": state.params, "opt_state": state.opt_state}
    cm = CheckpointManager(str(tmp_path / "ckpt"))
    best = cm.save(tree, step=1, key_metric=0.5)

    # simulate a crash during the next save: a partial step dir exists but
    # the `latest` symlink never moved
    os.makedirs(str(tmp_path / "ckpt" / "step_2"))
    restored = cm.restore(tree)
    assert restored is not None and restored[1] == 1  # old ckpt intact

    # the next successful save supersedes and garbage-collects the partial
    best = cm.save(tree, step=3, key_metric=0.4, best=best)
    assert best == 0.4
    restored = cm.restore(tree)
    assert restored[1] == 3
    assert cm.restore(tree, tag="best")[1] == 3
    names = set(os.listdir(str(tmp_path / "ckpt")))
    assert "step_2" not in names and "step_1" not in names
    # latest/best are symlinks into an immutable step dir
    assert os.path.islink(str(tmp_path / "ckpt" / "latest"))
    assert os.path.islink(str(tmp_path / "ckpt" / "best"))


def test_scene_batched_dp_matches_single_device():
    """A 4-scene batch trained on a (4, 2) mesh (scenes on `data` via
    vmap(spmd_axis_name), rays on `space`) must match the same batched step
    on one device (SURVEY §2.8: DP over scenes — the thing the reference
    never had)."""
    from graspnerf_tpu.data.prefetch import collate_scenes
    from graspnerf_tpu.parallel import shard_batch, DATA_AXIS
    from graspnerf_tpu.train import make_batched_loss_fn

    samples = [jax.tree_util.tree_map(np.asarray, tiny_batch(seed=s))
               for s in range(4)]
    batch = jax.tree_util.tree_map(jnp.asarray, collate_scenes(samples))

    model = GraspNeRF(renderer_cfg=dict(CFG))
    state0 = create_train_state(model, batch, jax.random.PRNGKey(0),
                                scene_batch=True)

    single = make_train_step(model, scene_batch=True)
    s1, m1 = single(jax.tree_util.tree_map(jnp.copy, state0), batch,
                    jax.random.PRNGKey(7))

    mesh = make_mesh(4, 2)
    sharded_model = GraspNeRF(renderer_cfg=dict(CFG, space_axis=SPACE_AXIS))
    with jax.set_mesh(mesh):
        rep = NamedSharding(mesh, P())
        state = jax.device_put(jax.tree_util.tree_map(jnp.copy, state0), rep)
        b = shard_batch(mesh, batch, scene_axis=True)
        # scene axis really lands on `data`
        spec = b["data"]["que"]["coords"].sharding.spec
        assert spec[0] == DATA_AXIS
        step = make_train_step(sharded_model, out_sharding=rep,
                               scene_batch=True, spmd_axis=DATA_AXIS)
        s2, m2 = step(state, b, jax.random.PRNGKey(7))
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-3,
                                   atol=2e-4, err_msg=k)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params)
    # Adam divides by sqrt(v)+eps at step 1, amplifying reduction-order fp
    # noise from the cross-device scene mean to O(lr); allow a few lr units
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-4


def test_batched_loss_is_mean_of_scenes():
    """make_batched_loss_fn == mean of per-scene losses (same rng split)."""
    from graspnerf_tpu.data.prefetch import collate_scenes
    from graspnerf_tpu.train import make_batched_loss_fn, make_loss_fn

    samples = [jax.tree_util.tree_map(np.asarray, tiny_batch(seed=s))
               for s in range(2)]
    batch = jax.tree_util.tree_map(jnp.asarray, collate_scenes(samples))
    model = GraspNeRF(renderer_cfg=dict(CFG))
    state = create_train_state(model, batch, jax.random.PRNGKey(0),
                               scene_batch=True)

    key = jax.random.PRNGKey(3)
    total_b, ld_b = jax.jit(make_batched_loss_fn(model))(state.params, batch,
                                                         key)
    keys = jax.random.split(key, 2)
    lf = make_loss_fn(model)
    totals = []
    for i in range(2):
        b_i = jax.tree_util.tree_map(lambda x, i=i: x[i], batch)
        t_i, _ = lf(state.params, b_i, keys[i])
        totals.append(float(t_i))
    np.testing.assert_allclose(float(total_b), np.mean(totals), rtol=1e-5)


def test_prefetch_loader_overlaps_and_collates():
    from graspnerf_tpu.data.prefetch import PrefetchLoader

    def factory(seed):
        return SyntheticSceneDataset(h=32, w=32, n_rays=16, n_grasps=8,
                                     seed=seed, fuse_views=6, resolution=16)

    loader = PrefetchLoader(factory, num_workers=2, scenes_per_batch=2,
                            buffer_size=4, seed=0)
    b = next(loader)
    assert b["sdf_gt"].shape[0] == 2
    assert b["data"]["que"]["coords"].shape[:2] == (2, 1)
    b2 = next(loader)
    assert np.isfinite(loader.pop_data_wait())
    loader.close()
