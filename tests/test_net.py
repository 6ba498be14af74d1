"""Network zoo: init statistics, feature maps, stage composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.core import net


def test_init_statistics():
    key = jax.random.PRNGKey(0)
    params = net.init_mlp(key, [3, 256, 256, 1])
    w = params[1]["w"]
    std_expected = np.sqrt(2.0 / (256 + 256))
    # truncated normal ±2σ has std ≈ 0.88σ of the untruncated
    assert 0.6 * std_expected < float(jnp.std(w)) < 1.0 * std_expected
    assert float(jnp.max(jnp.abs(w))) <= 2.0 * std_expected + 1e-6
    assert params[0]["w"].shape == (3, 256)
    assert params[2]["b"].shape == (1,)


def test_feature_map_reference_semantics():
    """minmax+periodic reproduces the reference input embedding
    [2(r-lb)/(ub-lb)-1, cos θ, sin θ] (software.py:172-175)."""
    fm = net.feature_map_for(["minmax", "periodic"])
    assert fm.num_features == 3
    lb = jnp.array([0.1, 0.0])
    ub = jnp.array([1.0, 1.0])
    z = jnp.array([[0.55, 0.7], [0.1, 0.0]])
    h = fm(z, lb, ub)
    np.testing.assert_allclose(h[0, 0], 2 * (0.55 - 0.1) / 0.9 - 1, atol=1e-6)
    np.testing.assert_allclose(h[0, 1], np.cos(0.7), rtol=1e-6)
    np.testing.assert_allclose(h[0, 2], np.sin(0.7), rtol=1e-6)
    np.testing.assert_allclose(h[1], [-1.0, 1.0, 0.0], atol=1e-6)


def _setup(spec, kinds=("minmax", "periodic")):
    fm = net.feature_map_for(kinds)
    key = jax.random.PRNGKey(42)
    params = net.init_params(key, spec, fm)
    lb = jnp.array([0.1, 0.0])
    ub = jnp.array([1.0, 1.0])
    return fm, params, lb, ub


def test_predictor_shapes_and_scaling():
    spec = net.MLPSpec(depth=3, width=32, scl=2.0, epsil=0.5)
    fm, params, lb, ub = _setup(spec)
    f_u = net.make_predictor(spec, fm, lb, ub)
    z = jax.random.uniform(jax.random.PRNGKey(1), (17, 2))
    u = f_u(params, z)
    assert u.shape == (17, 1)
    # epsil is a pure output scale
    spec2 = net.MLPSpec(depth=3, width=32, scl=2.0, epsil=1.0)
    f_u2 = net.make_predictor(spec2, fm, lb, ub)
    np.testing.assert_allclose(u, 0.5 * f_u2(params, z), rtol=1e-6)


def test_sin_first_activation_scl_inside():
    """scl multiplies the pre-activation of the FIRST layer only
    (software.py:178)."""
    spec_a = net.MLPSpec(depth=1, width=8, act_first="sin", scl=3.0)
    fm, params, lb, ub = _setup(spec_a)
    z = jnp.array([[0.3, 0.2]])
    h = fm(z, lb, ub)
    first, last = params["layers"]
    manual = jnp.sin(h @ first["w"] * 3.0 + first["b"]) @ last["w"] + last["b"]
    np.testing.assert_allclose(
        net.make_predictor(spec_a, fm, lb, ub)(params, z), manual, rtol=1e-6
    )


def test_stage_composition_frozen():
    spec1 = net.MLPSpec(depth=2, width=16)
    fm, params1, lb, ub = _setup(spec1)
    f1 = net.make_predictor(spec1, fm, lb, ub)

    spec2 = net.MLPSpec(depth=2, width=16, act_first="sin", scl=5.0, epsil=0.1)
    params2 = net.init_params(jax.random.PRNGKey(7), spec2, fm)
    f2 = net.compose_stages(f1, spec2, fm, lb, ub)
    params = net.compose_params(params2, params1)
    z = jax.random.uniform(jax.random.PRNGKey(2), (9, 2))
    u2 = f2(params, z)
    stage_only = net.make_predictor(spec2, fm, lb, ub)(params2, z)
    np.testing.assert_allclose(u2, f1(params1, z) + stage_only, rtol=1e-6)

    # the previous stage is FROZEN: gradients into the prev subtree are
    # exactly zero (stop_gradient threading, not closure capture)
    g = jax.grad(lambda p: jnp.sum(f2(p, z) ** 2))(params)
    assert all(
        float(jnp.max(jnp.abs(x))) == 0.0
        for x in jax.tree_util.tree_leaves(g["prev"])
    )
    assert any(
        float(jnp.max(jnp.abs(x))) > 0.0
        for x in jax.tree_util.tree_leaves(g["stage"])
    )


def test_fourier_and_modified_families():
    fm = net.feature_map_for(["identity", "identity"])
    z = jax.random.uniform(jax.random.PRNGKey(3), (11, 2))
    for spec in [
        net.MLPSpec(depth=2, width=16, fourier_features=8, fourier_scale=3.0),
        net.MLPSpec(depth=2, width=16, modified=True),
        net.MLPSpec(depth=2, width=16, fourier_features=8, modified=True),
    ]:
        params = net.init_params(jax.random.PRNGKey(4), spec, fm)
        f_u = net.make_predictor(spec, fm, jnp.zeros(2), jnp.ones(2))
        u = f_u(params, z)
        assert u.shape == (11, 1)
        assert bool(jnp.all(jnp.isfinite(u)))
        # must be differentiable for PINN residuals
        g = jax.grad(lambda p: jnp.sum(f_u(p, z) ** 2))(params)
        assert net.num_params(g) == net.num_params(params)


def test_hard_bc_wrapper_exact_on_boundary():
    """u = lift + bubble*N meets Dirichlet data to machine precision for
    any network output (net.wrap_hard_bc; annulus lift/bubble recipe)."""
    from tpinn.core import pde

    fm = net.feature_map_for(["minmax", "periodic"])
    spec = net.MLPSpec(depth=2, width=8)
    lb, ub = jnp.asarray([0.1, 0.0]), jnp.asarray([1.0, 6.2831853])
    params = net.init_params(jax.random.PRNGKey(0), spec, fm)
    raw = net.make_predictor(spec, fm, lb, ub)
    coords = ("r", "t")
    lift = pde.compile_coord_expr("(1 - r)/0.9", coords)
    bubble = pde.compile_coord_expr("(r - 0.1)*(1 - r)", coords)
    f = net.wrap_hard_bc(raw, lift, bubble)

    t = jnp.linspace(0.0, 6.28, 9)[:, None]
    z_in = jnp.concatenate([jnp.full_like(t, 0.1), t], axis=1)
    z_out = jnp.concatenate([jnp.full_like(t, 1.0), t], axis=1)
    assert float(jnp.max(jnp.abs(f(params, z_in) - 1.0))) < 1e-6
    assert float(jnp.max(jnp.abs(f(params, z_out)))) < 1e-6
    # interior differs from the lift (the net contributes)
    z_mid = jnp.concatenate([jnp.full_like(t, 0.5), t], axis=1)
    assert float(jnp.max(jnp.abs(f(params, z_mid) - lift(z_mid)))) > 0.0
    # raw chain stays reachable for stage composition
    assert f.tpinn_raw is raw
