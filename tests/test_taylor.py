"""Fused Taylor-2 engine vs the generic nested-jvp engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.core import deriv, net, pde, taylor


IDX = [(), (0,), (1,), (0, 0), (1, 1), (0, 1)]


def _setup(act="tanh", kinds=("minmax", "periodic"), depth=3, width=20,
           scl=2.0, epsil=0.7):
    fm = net.feature_map_for(kinds)
    spec = net.MLPSpec(depth=depth, width=width, act_first=act, scl=scl,
                       epsil=epsil)
    params = net.init_params(jax.random.PRNGKey(0), spec, fm)
    lb = jnp.array([0.1, 0.0])
    ub = jnp.array([1.0, 1.0])
    predictor = net.make_predictor(spec, fm, lb, ub)
    z = jax.random.uniform(jax.random.PRNGKey(1), (37, 2), minval=0.2,
                           maxval=0.9)
    return predictor, params, z, (spec, fm, lb, ub)


@pytest.mark.parametrize("act,kinds", [
    ("tanh", ("minmax", "periodic")),
    ("sin", ("minmax", "minmax")),
    ("tanh", ("identity", "identity")),
])
def test_taylor2_matches_generic(act, kinds):
    predictor, params, z, _ = _setup(act=act, kinds=kinds)
    fused = predictor.tpinn_partials(params, z, IDX)
    generic = deriv.partials(lambda zz: predictor(params, zz), z, IDX)
    for ix in IDX:
        np.testing.assert_allclose(
            np.asarray(fused[ix]), np.asarray(generic[ix]),
            rtol=2e-4, atol=1e-5, err_msg=str(ix),
        )


def test_taylor2_composed_stage():
    predictor1, params1, z, (spec, fm, lb, ub) = _setup()
    spec2 = net.MLPSpec(depth=2, width=16, act_first="sin", scl=4.0,
                        epsil=0.2)
    predictor2 = net.compose_stages(predictor1, spec2, fm, lb, ub)
    params2 = net.compose_params(
        net.init_params(jax.random.PRNGKey(5), spec2, fm), params1
    )

    fused = predictor2.tpinn_partials(params2, z, IDX)
    generic = deriv.partials(lambda zz: predictor2(params2, zz), z, IDX)
    for ix in IDX:
        np.testing.assert_allclose(
            np.asarray(fused[ix]), np.asarray(generic[ix]),
            rtol=3e-4, atol=1e-5, err_msg=str(ix),
        )


def test_taylor2_gradients_match_generic():
    """jax.grad through the fused engine == grad through nested jvp —
    the training path depends on this."""
    predictor, params, z, _ = _setup(depth=2, width=12)
    compiled = pde.compile_pde("u_rr + 1/r*u_r + 1/r**2*u_tt",
                               coords=("r", "t"))

    def loss_fused(p):
        f = compiled.residual_fast(predictor, p, z)
        return jnp.mean(f**2)

    def loss_generic(p):
        f = compiled.residual(lambda zz: predictor(p, zz), z)
        return jnp.mean(f**2)

    g1 = jax.jit(jax.grad(loss_fused))(params)
    g2 = jax.jit(jax.grad(loss_generic))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=1e-5)


def test_fast_partials_fallback_order3():
    """Order-3 equations silently use the generic engine."""
    predictor, params, z, _ = _setup(depth=2, width=10)
    compiled = pde.compile_pde("u_rrr + u_r", coords=("r", "t"))
    assert compiled.max_order == 3
    f = compiled.residual_fast(predictor, params, z)
    assert f.shape == (37, 1)
    assert bool(jnp.all(jnp.isfinite(f)))


def test_fast_partials_fallback_fourier():
    """Fourier-feature nets lack a fused engine; the loss still works."""
    fm = net.feature_map_for(("identity", "identity"))
    spec = net.MLPSpec(depth=2, width=12, fourier_features=4)
    params = net.init_params(jax.random.PRNGKey(2), spec, fm)
    predictor = net.make_predictor(spec, fm, jnp.zeros(2), jnp.ones(2))
    assert not hasattr(predictor, "tpinn_partials")
    compiled = pde.compile_pde("u_xx + u_yy", coords=("x", "y"))
    z = jax.random.uniform(jax.random.PRNGKey(3), (9, 2))
    f = compiled.residual_fast(predictor, params, z)
    assert f.shape == (9, 1)


def test_plan_streams():
    streams = taylor.plan_streams([(0, 0), (1, 1)])
    assert streams == [(), (0,), (1,), (0, 0), (1, 1)]
    streams = taylor.plan_streams([(0, 1)])
    assert streams == [(), (0,), (1,), (0, 1)]
    with pytest.raises(ValueError):
        taylor.plan_streams([(0, 0, 0)])


def test_siren_style_all_sin():
    """act_hidden='sin' (SIREN-style) propagates correctly through all
    three paths: apply, fused Taylor-2, generic."""
    fm = net.feature_map_for(("minmax", "minmax"))
    spec = net.MLPSpec(depth=3, width=16, act_first="sin", act_hidden="sin",
                      scl=3.0)
    params = net.init_params(jax.random.PRNGKey(0), spec, fm)
    lb, ub = jnp.zeros(2), jnp.ones(2)
    predictor = net.make_predictor(spec, fm, lb, ub)
    z = jax.random.uniform(jax.random.PRNGKey(1), (25, 2))
    fused = predictor.tpinn_partials(params, z, IDX)
    generic = deriv.partials(lambda zz: predictor(params, zz), z, IDX)
    for ix in IDX:
        np.testing.assert_allclose(np.asarray(fused[ix]),
                                   np.asarray(generic[ix]),
                                   rtol=3e-4, atol=1e-5, err_msg=str(ix))


def test_taylor2_padded_features_matches_generic():
    """FeatureMap.pad_to duplicates column 0 (SIGILL workaround): the fused
    stream construction must carry the duplicate's derivative streams."""
    fm = net.feature_map_for(("minmax", "minmax"), pad_to=3)
    spec = net.MLPSpec(depth=3, width=20, scl=1.5, epsil=0.7)
    params = net.init_params(jax.random.PRNGKey(0), spec, fm)
    assert params["layers"][0]["w"].shape[0] == 3
    lb, ub = jnp.array([0.0, 0.0]), jnp.array([1.0, 1.0])
    predictor = net.make_predictor(spec, fm, lb, ub)
    z = jax.random.uniform(jax.random.PRNGKey(1), (29, 2), minval=0.1,
                           maxval=0.9)
    fused = predictor.tpinn_partials(params, z, IDX)
    generic = deriv.partials(lambda zz: predictor(params, zz), z, IDX)
    for ix in IDX:
        np.testing.assert_allclose(
            np.asarray(fused[ix]), np.asarray(generic[ix]),
            rtol=2e-4, atol=1e-5, err_msg=str(ix),
        )


def test_taylor2_hard_bc_wrapper_matches_generic():
    """net.wrap_hard_bc exposes fused partials via the product rule; they
    must match the generic nested-jvp on the wrapped callable."""
    predictor, params, z, (spec, fm, lb, ub) = _setup()
    lift = pde.compile_coord_expr("(1 - r)/0.9", ("r", "t"))
    bubble = pde.compile_coord_expr("(r - 0.1)*(1 - r)", ("r", "t"))
    wrapped = net.wrap_hard_bc(predictor, lift, bubble)
    fused = wrapped.tpinn_partials(params, z, IDX)
    generic = deriv.partials(lambda zz: wrapped(params, zz), z, IDX)
    for ix in IDX:
        np.testing.assert_allclose(
            np.asarray(fused[ix]), np.asarray(generic[ix]),
            rtol=3e-4, atol=1e-5, err_msg=str(ix),
        )
