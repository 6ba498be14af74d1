"""Loss system: loss_info contract, normalization, deriv-loss term, engines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.core import loss as loss_mod
from tpinn.core import net, pde, sample


def _setup():
    fm = net.feature_map_for(("minmax", "periodic"))
    spec = net.MLPSpec(depth=2, width=12)
    params = net.init_params(jax.random.PRNGKey(0), spec, fm)
    lb, ub = jnp.array([0.1, 0.0]), jnp.array([1.0, 1.0])
    predictor = net.make_predictor(spec, fm, lb, ub)
    compiled = pde.compile_pde("u_rr + 1/r*u_r + 1/r**2*u_tt",
                               coords=("r", "t"))
    key = jax.random.PRNGKey(1)
    x_col = jax.random.uniform(key, (200, 2), minval=0.2, maxval=0.9)
    x_bd = [jnp.stack([jnp.full(30, 0.1),
                       jnp.linspace(0, 1, 30)], axis=1),
            jnp.stack([jnp.full(30, 1.0),
                       jnp.linspace(0, 1, 30)], axis=1)]
    u_bd = [jnp.ones((30, 1)), jnp.zeros((30, 1))]
    data = {"x_col": x_col, "x_bd": x_bd, "u_bd": u_bd}
    return predictor, compiled, params, data


def test_loss_info_layout_and_normalization():
    predictor, compiled, params, data = _setup()
    loss_fn = loss_mod.make_loss(predictor, compiled)
    lw = jnp.array([0.05, 0.0])
    loss_n, info = jax.jit(loss_fn)(params, data, lw, jnp.array(2.0))
    # layout: [loss, loss_data, loss_eqn, data_err1, data_err2, eqn_err]
    assert info.shape == (6,)
    np.testing.assert_allclose(float(info[0]),
                               float(info[1] + 0.05 * info[2]), rtol=1e-5)
    np.testing.assert_allclose(float(info[1]),
                               float(info[3] + info[4]), rtol=1e-5)
    np.testing.assert_allclose(float(loss_n), float(info[0]) / 2.0, rtol=1e-6)
    assert loss_mod.loss_info_width(2) == 6


def test_engines_agree():
    predictor, compiled, params, data = _setup()
    lw = jnp.array([1.0, 0.0])
    ref = jnp.array(1.0)
    l_auto = loss_mod.make_loss(predictor, compiled, engine="fused")
    l_gen = loss_mod.make_loss(predictor, compiled, engine="generic")
    a = jax.jit(l_auto)(params, data, lw, ref)
    b = jax.jit(l_gen)(params, data, lw, ref)
    np.testing.assert_allclose(float(a[0]), float(b[0]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), rtol=1e-4)


@pytest.mark.slow
def test_deriv_loss_term():
    """lw[1] weights a real residual-gradient term (the reference's dead
    'df' weight made live)."""
    predictor, compiled, params, data = _setup()
    loss_fn = loss_mod.make_loss(predictor, compiled, deriv_loss=True)
    lw0 = jnp.array([1.0, 0.0])
    lw1 = jnp.array([1.0, 0.5])
    l0, info0 = jax.jit(loss_fn)(params, data, lw0, jnp.array(1.0))
    l1, info1 = jax.jit(loss_fn)(params, data, lw1, jnp.array(1.0))
    # one extra eqn_err column
    assert info0.shape == (7,)
    # df term is positive, so weighting it raises the loss
    assert float(l1) > float(l0)
    np.testing.assert_allclose(
        float(info1[2]), float(info1[5] + 0.5 * info1[6]), rtol=1e-5)
    # gradable
    g = jax.grad(lambda p: loss_fn(p, data, lw1, jnp.array(1.0))[0])(params)
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree_util.tree_leaves(g))


def test_relative_l2():
    u = jnp.array([[1.0], [2.0]])
    assert float(loss_mod.relative_l2(u, u)) == 0.0
    err = loss_mod.relative_l2(u * 1.1, u)
    np.testing.assert_allclose(float(err), 0.1, rtol=1e-5)


def test_residual_weight():
    """residual_weight_fn scales the residual pointwise before the MSE
    (weighted-residual PINN); data terms are untouched."""
    from tpinn import problems

    problem = problems.heat_2d()
    compiled = pde.compile_pde(problem.equation, problem.coords)
    fm = net.feature_map_for(problem.feature_kinds)
    spec = net.MLPSpec(depth=2, width=8)
    params = net.init_params(jax.random.PRNGKey(0), spec, fm)
    predictor = net.make_predictor(spec, fm, jnp.zeros(2), jnp.ones(2))
    w_fn = pde.compile_coord_expr("exp(4*t)", problem.coords)

    z = jax.random.uniform(jax.random.PRNGKey(1), (64, 2))
    data = {"x_col": z, "x_bd": [], "u_bd": []}
    lw = jnp.asarray([1.0, 0.0])
    ref = jnp.asarray(1.0)

    plain = loss_mod.make_loss(predictor, compiled)
    weighted = loss_mod.make_loss(predictor, compiled,
                                  residual_weight_fn=w_fn)
    _, info_p = plain(params, data, lw, ref)
    _, info_w = weighted(params, data, lw, ref)

    f = compiled.residual(lambda zz: predictor(params, zz), z)
    expect = jnp.mean((w_fn(z) * f) ** 2)
    np.testing.assert_allclose(float(info_w[2]), float(expect), rtol=1e-5)
    assert float(info_w[2]) != pytest.approx(float(info_p[2]))


def test_causal_eps_zero_is_exactly_plain():
    """causal={eps: 0} must reproduce the plain loss AND gradient bit-for-
    bit in structure (per-point weights of 1.0) — the docstring's claim."""
    predictor, compiled, params, data = _setup()
    lw = jnp.array([0.7, 0.0])
    ref = jnp.array(1.0)
    plain = loss_mod.make_loss(predictor, compiled)
    caus = loss_mod.make_loss(
        predictor, compiled,
        causal={"axis": 1, "t0": 0.0, "t1": 1.0, "bins": 8, "eps": 0.0})
    a = jax.jit(plain)(params, data, lw, ref)
    b = jax.jit(caus)(params, data, lw, ref)
    np.testing.assert_allclose(float(a[0]), float(b[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), rtol=1e-6)
    ga = jax.grad(lambda p: plain(p, data, lw, ref)[0])(params)
    gb = jax.grad(lambda p: caus(p, data, lw, ref)[0])(params)
    for x, y in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-9)


def test_causal_downweights_late_slabs_only():
    """eps>0 shrinks the optimized loss_eqn (late slabs carry weight<1)
    while the watched eqn_err column and the data term stay untouched."""
    predictor, compiled, params, data = _setup()
    lw = jnp.array([1.0, 0.0])
    ref = jnp.array(1.0)
    plain = loss_mod.make_loss(predictor, compiled)
    caus = loss_mod.make_loss(
        predictor, compiled,
        causal={"axis": 1, "t0": 0.0, "t1": 1.0, "bins": 8, "eps": 50.0})
    _, ia = jax.jit(plain)(params, data, lw, ref)
    _, ib = jax.jit(caus)(params, data, lw, ref)
    assert float(ib[2]) < float(ia[2])          # optimized term shrank
    np.testing.assert_allclose(float(ib[-1]), float(ia[-1]), rtol=1e-6)
    np.testing.assert_allclose(float(ib[1]), float(ia[1]), rtol=1e-6)
    # internal consistency of the causal loss_info itself
    np.testing.assert_allclose(float(ib[0]), float(ib[1] + 1.0 * ib[2]),
                               rtol=1e-5)
    # still gradable and jittable
    g = jax.grad(lambda p: caus(p, data, lw, ref)[0])(params)
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree_util.tree_leaves(g))


def test_empty_boundary_batch_is_zero_not_nan():
    """n_bd=0 is legal with a full hard-BC ansatz: ms_error on an empty
    batch must contribute 0 (jnp.mean over a zero-length axis is NaN and
    used to poison the total loss — wvA regression)."""
    assert np.all(np.asarray(loss_mod.ms_error(jnp.zeros((0, 1)))) == 0.0)

    predictor, compiled, params, data = _setup()
    data = dict(data,
                x_bd=[jnp.zeros((0, 2)), jnp.zeros((0, 2))],
                u_bd=[jnp.zeros((0, 1)), jnp.zeros((0, 1))])
    loss_fn = loss_mod.make_loss(predictor, compiled)
    ln, info = jax.jit(loss_fn)(params, data, jnp.array([1.0, 0.0]),
                                jnp.array(1.0))
    assert np.isfinite(float(ln)) and np.isfinite(np.asarray(info)).all()
