"""Pallas view-fusion kernel vs the flax-module oracle.

Runs the kernel in Mosaic interpret mode (no TPU needed) and checks the full
IBRNetNeus outputs (rgb, sdf, grad) and parameter gradients match the oracle
path elementwise."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from graspnerf_tpu import models as M
from graspnerf_tpu.ops.pallas.ibrnet_fuse import view_fuse_reference


def _inputs(rng, R=4, D=24, V=6):
    N = R * D
    rgbf = jnp.asarray(rng.rand(V, N, 35).astype(np.float32))
    neur = jnp.asarray(rng.rand(V, N, 32).astype(np.float32))
    diff = jnp.asarray((rng.rand(V, N, 4) - 0.5).astype(np.float32))
    mask = jnp.asarray((rng.rand(V, N, 1) > 0.2).astype(np.float32))
    pts = jnp.asarray(((rng.rand(1, R, D, 3) - 0.5) * 0.4).astype(np.float32))
    return rgbf, neur, diff, mask, pts, (R, D)


def test_reference_matches_modules(rng):
    """view_fuse_reference (the kernel's backward oracle) == flax modules."""
    rgbf, neur, diff, mask, pts, rd = _inputs(rng)
    m = M.IBRNetNeus(use_pallas=False)
    variables = m.init(jax.random.PRNGKey(0), rgbf, neur, diff, mask, pts, rd)

    mod_out = m.apply(variables, rgbf, neur, diff, mask, pts, rd)

    bound = m.bind(variables)
    weights = bound._collect_weights()
    fc, nv, x, vis = view_fuse_reference(rgbf, neur, diff, mask, weights)
    fc_m, nv_m, x_m, vis_m = bound._view_fuse_modules(rgbf, neur, diff, mask)
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fc_m), atol=1e-6)
    np.testing.assert_allclose(np.asarray(nv), np.asarray(nv_m), atol=0)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_m), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vis), np.asarray(vis_m), atol=1e-6)
    assert all(np.isfinite(np.asarray(o)).all() for o in mod_out)


def test_kernel_interpret_matches_oracle(rng):
    """Full IBRNetNeus with the Pallas kernel (interpret mode) == oracle."""
    rgbf, neur, diff, mask, pts, rd = _inputs(rng)
    m_o = M.IBRNetNeus(use_pallas=False)
    variables = m_o.init(jax.random.PRNGKey(0), rgbf, neur, diff, mask, pts,
                         rd)
    rgb_o, sdf_o, grad_o = m_o.apply(variables, rgbf, neur, diff, mask, pts,
                                     rd)

    m_p = M.IBRNetNeus(use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        rgb_p, sdf_p, grad_p = m_p.apply(variables, rgbf, neur, diff, mask,
                                         pts, rd)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_o), atol=2e-6)
    np.testing.assert_allclose(np.asarray(sdf_p), np.asarray(sdf_o), atol=2e-6)
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_o),
                               atol=1e-5)


def test_kernel_gradients_match_oracle(rng):
    """d(loss)/d(params, inputs) through the custom_vjp == oracle autodiff."""
    rgbf, neur, diff, mask, pts, rd = _inputs(rng, R=2, D=16)
    m_o = M.IBRNetNeus(use_pallas=False)
    variables = m_o.init(jax.random.PRNGKey(0), rgbf, neur, diff, mask, pts,
                         rd)

    def loss(model):
        def f(params, rgbf, neur):
            rgb, sdf, grad = model.apply({"params": params}, rgbf, neur,
                                         diff, mask, pts, rd)
            return (jnp.sum(rgb ** 2) + jnp.sum(jnp.abs(sdf))
                    + jnp.sum(grad ** 2))
        return f

    go = jax.grad(loss(m_o), argnums=(0, 1, 2))(
        variables["params"], rgbf, neur)
    m_p = M.IBRNetNeus(use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss(m_p), argnums=(0, 1, 2))(
            variables["params"], rgbf, neur)
    flat_o = jax.tree_util.tree_leaves(go)
    flat_p = jax.tree_util.tree_leaves(gp)
    assert len(flat_o) == len(flat_p)
    for a, b in zip(flat_p, flat_o):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
