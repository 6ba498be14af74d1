"""Inverse-problem tests: parameterized equations + coefficient recovery.

The reference has no inverse capability (its residual is hardcoded,
software.py:283-297); tpinn.core.inverse adds the classic PINN inverse
formulation.  These tests cover the grammar extension (named unknown
coefficients in tpinn.core.pde) and end-to-end identification on two
analytic benchmarks small enough for the CPU suite.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.core import pde, sample
from tpinn.core.inverse import InverseSpec, run_inverse, synth_observations
from tpinn.core.train import ProblemSpec, StageSpec, TrainSpec

PI = np.pi


# ---------------------------------------------------------------------------
# Grammar: Param nodes
# ---------------------------------------------------------------------------


def test_param_parse_and_evaluate():
    p = pde.compile_pde("u_t - lam*u_xx", ("x", "t"), params=("lam",))
    assert p.param_names == ("lam",)
    assert p.is_linear  # affine in u for any fixed coefficient

    f_u = lambda z: jnp.exp(-z[:, 1:2]) * jnp.sin(z[:, 0:1])
    z = jnp.asarray(np.random.RandomState(0).rand(9, 2), jnp.float32)
    # u_t = -u, u_xx = -u: residual = -u + lam*u — zero exactly at lam=1
    r = p.residual(f_u, z, {"lam": jnp.float32(1.0)})
    assert float(jnp.abs(r).max()) < 1e-5
    r_half = p.residual(f_u, z, {"lam": jnp.float32(0.5)})
    assert float(jnp.abs(r_half).max()) > 1e-2


def test_param_gradient_flows():
    p = pde.compile_pde("lam*u_xx + u", ("x",), params=("lam",))
    f_u = lambda z: jnp.sin(z)
    z = jnp.linspace(0.1, 1.0, 7)[:, None]
    g = jax.grad(
        lambda lam: jnp.sum(p.residual(f_u, z, {"lam": lam}) ** 2)
    )(jnp.float32(0.3))
    # d/dlam sum((lam*uxx + u)^2) = 2 sum((lam*uxx+u)*uxx); at lam=0.3 with
    # uxx=-sin, u=sin: residual=0.7 sin, grad = -1.4 sum(sin^2)
    expect = -1.4 * float(jnp.sum(jnp.sin(z) ** 2))
    assert abs(float(g) - expect) < 1e-4


def test_param_errors():
    # undeclared identifier still rejected
    with pytest.raises(pde.PDESyntaxError):
        pde.compile_pde("u_x + lam*u", ("x",))
    # name collisions rejected
    for bad in ("x", "u", "sin", "pi"):
        with pytest.raises(pde.PDESyntaxError):
            pde.compile_pde("u_x", ("x",), params=(bad,))
    # missing coefficient value at evaluation time
    p = pde.compile_pde("lam*u_x", ("x",), params=("lam",))
    with pytest.raises(KeyError):
        p.residual(lambda z: z, jnp.ones((3, 1)))


def test_forward_equations_unchanged():
    # no params declared → identical behavior to the forward compiler
    p = pde.compile_pde("u_xx + u_yy", ("x", "y"))
    assert p.param_names == ()
    f_u = lambda z: z[:, :1] ** 2 + z[:, 1:2] ** 2
    z = jnp.asarray(np.random.RandomState(1).rand(5, 2), jnp.float32)
    r = p.residual(f_u, z)
    np.testing.assert_allclose(np.asarray(r), 4.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# End-to-end identification
# ---------------------------------------------------------------------------


def _poisson_inverse_problem():
    return ProblemSpec(
        name="poisson_1d_inverse",
        equation="lam*u_xx + sin(pi*x)",
        coords=("x",), lb=(0.0,), ub=(1.0,),
        bc_groups=(),
        exact=lambda z: jnp.sin(PI * z[:, :1]),
        hard_bc=("0", "x*(1-x)"),
    )


def test_recover_poisson_coefficient():
    # -d/dx(lam u_xx) = f with u = sin(pi x): true lam = 1/pi^2
    prob = _poisson_inverse_problem()
    inv = InverseSpec(params=("lam",), init=(0.5,), n_obs=50)
    spec = TrainSpec(
        n_col=256, n_band=0, n_adaptive=64, n_bd=16,
        stages=(StageSpec(depth=3, width=16,
                          adam_epochs=400, lbfgs_epochs=150),),
        grid=64, lw=(1.0, 0.0), testing_size=(201,), pad_features=3,
        log_every=200,
    )
    r = run_inverse(prob, inv, spec)
    true = 1.0 / PI**2
    assert abs(r.coef["lam"] - true) / true < 5e-3
    assert r.rel_l2 < 5e-3
    # L-BFGS sharpened the Adam estimate
    assert abs(r.coef["lam"] - true) <= abs(r.coef_adam["lam"] - true)
    # history carries both phases with the widened loss_info (obs column)
    assert r.history.shape[1] == 3 + 0 + 1 + 1


def test_recover_heat_diffusivity():
    # u_t = lam*u_xx with u = exp(-pi^2 t) sin(pi x): true lam = 1.
    # Soft Dirichlet sides + the initial condition as a value_fn BC group
    # (the standard inverse-heat setup); identification needs the deep
    # L-BFGS polish — after Adam alone lam is still ~0.68.
    prob = ProblemSpec(
        name="heat_inverse",
        equation="u_t - lam*u_xx",
        coords=("x", "t"), lb=(0.0, 0.0), ub=(1.0, 0.5),
        bc_groups=(
            sample.BCGroup(lo=(0.0, 0.0), hi=(0.0, 0.5), value=0.0),
            sample.BCGroup(lo=(1.0, 0.0), hi=(1.0, 0.5), value=0.0),
            sample.BCGroup(lo=(0.0, 0.0), hi=(1.0, 0.0),
                           value_fn=lambda z: jnp.sin(PI * z[:, :1])),
        ),
        exact=lambda z: jnp.exp(-PI**2 * z[:, 1:2]) * jnp.sin(PI * z[:, :1]),
    )
    inv = InverseSpec(params=("lam",), init=(0.3,), n_obs=120)
    spec = TrainSpec(
        n_col=384, n_band=0, n_adaptive=128, n_bd=32,
        stages=(StageSpec(depth=3, width=24,
                          adam_epochs=800, lbfgs_epochs=2400),),
        grid=48, lw=(1.0, 0.0), testing_size=(64, 64), pad_features=3,
        log_every=400,
    )
    r = run_inverse(prob, inv, spec)
    assert abs(r.coef["lam"] - 1.0) < 1e-2
    assert r.rel_l2 < 1e-2


def test_noisy_observations_still_identify():
    prob = _poisson_inverse_problem()
    inv = InverseSpec(params=("lam",), init=(0.5,), n_obs=80,
                      obs_noise=1e-3)
    spec = TrainSpec(
        n_col=256, n_band=0, n_adaptive=64, n_bd=16,
        stages=(StageSpec(depth=3, width=16,
                          adam_epochs=300, lbfgs_epochs=120),),
        grid=64, lw=(1.0, 0.0), testing_size=(201,), pad_features=3,
        log_every=200,
    )
    r = run_inverse(prob, inv, spec)
    true = 1.0 / PI**2
    assert abs(r.coef["lam"] - true) / true < 5e-2


def test_user_supplied_observations():
    prob = _poisson_inverse_problem()
    inv = InverseSpec(params=("lam",), init=(0.2,), n_obs=40)
    z_obs, u_obs = synth_observations(prob, inv, jnp.float32)
    spec = TrainSpec(
        n_col=192, n_band=0, n_adaptive=0, n_bd=16,
        stages=(StageSpec(depth=3, width=16,
                          adam_epochs=250, lbfgs_epochs=90),),
        grid=64, lw=(1.0, 0.0), testing_size=(201,), pad_features=3,
        log_every=200,
    )
    r = run_inverse(prob, inv, spec, observations=(z_obs, u_obs))
    np.testing.assert_array_equal(r.z_obs, np.asarray(z_obs))
    true = 1.0 / PI**2
    assert abs(r.coef["lam"] - true) / true < 2e-2


def test_synth_observations_requires_exact():
    prob = ProblemSpec(
        name="no_oracle", equation="lam*u_xx", coords=("x",),
        lb=(0.0,), ub=(1.0,), bc_groups=(),
    )
    inv = InverseSpec(params=("lam",), init=(1.0,))
    with pytest.raises(ValueError, match="analytic solution"):
        synth_observations(prob, inv, jnp.float32)


def test_inverse_spec_validation():
    with pytest.raises(ValueError):
        InverseSpec(params=("a", "b"), init=(1.0,))
    with pytest.raises(ValueError):
        InverseSpec(params=(), init=())


def test_inverse_checkpoint_serves(tmp_path):
    """run_inverse(output_dir=...) writes a servable checkpoint: the serve
    loader rebuilds the predictor WITHOUT a problem preset and evaluates
    the residual at the recovered coefficient values."""
    prob = _poisson_inverse_problem()
    inv = InverseSpec(params=("lam",), init=(0.5,), n_obs=40)
    spec = TrainSpec(
        n_col=192, n_band=0, n_adaptive=0, n_bd=16,
        stages=(StageSpec(depth=3, width=16,
                          adam_epochs=200, lbfgs_epochs=90),),
        grid=64, lw=(1.0, 0.0), testing_size=(101,), pad_features=3,
        log_every=200,
    )
    r = run_inverse(prob, inv, spec, output_dir=str(tmp_path))
    assert (tmp_path / "params_stage_1.npz").exists()
    rec = json.loads((tmp_path / "inverse.json").read_text())
    assert rec["coef"]["lam"] == pytest.approx(r.coef["lam"])

    from tpinn.app.serve import PINNServer

    srv = PINNServer(str(tmp_path / "params_stage_1.npz"))  # no preset
    assert srv._coef is not None
    z = np.linspace(0.1, 0.9, 9)[:, None].tolist()
    u_served = np.asarray(srv.predict(z))
    u_train = np.asarray(r.predict(jnp.asarray(z, jnp.float32)))[:, 0]
    np.testing.assert_allclose(u_served, u_train, rtol=1e-5, atol=1e-6)
    f = np.asarray(srv.residual(z))
    assert np.all(np.isfinite(f)) and float(np.abs(f).max()) < 1.0


# ---------------------------------------------------------------------------
# UI inverse mode (run_pinn_training options passthrough)
# ---------------------------------------------------------------------------


def test_parse_coef_list():
    from tpinn.core.train import parse_coef_list

    assert parse_coef_list("lam=0.5") == (("lam",), (0.5,))
    assert parse_coef_list(" a = 1 , b=2.5 ") == (("a", "b"), (1.0, 2.5))
    assert parse_coef_list("") == ((), ())
    with pytest.raises(ValueError, match="NAME=INIT"):
        parse_coef_list("lam")
    with pytest.raises(ValueError, match="bad coefficient name"):
        parse_coef_list("2x=1")


def test_coerce_inverse_ui_options():
    from tpinn.core.train import coerce_ui_option

    assert coerce_ui_option("inverse_params", "lam=0.5") == "lam=0.5"
    with pytest.raises(ValueError):
        coerce_ui_option("inverse_params", "lam")
    assert coerce_ui_option("oracle", "heat_2d") == "heat_2d"
    assert coerce_ui_option("oracle", "") == ""
    with pytest.raises(ValueError, match="unknown preset"):
        coerce_ui_option("oracle", "nope")
    assert coerce_ui_option("n_obs", 50) == 50
    assert coerce_ui_option("obs_noise", "0.01") == pytest.approx(0.01)


def test_validate_equation_with_params():
    # the UI validator admits declared unknowns only when told about them
    assert not pde.validate_equation("u_t - lam*u_xx")
    assert pde.validate_equation("u_t - lam*u_xx", params=("lam",))


@pytest.mark.slow
def test_ui_inverse_mode(tmp_path):
    """run_pinn_training(options={"inverse_params": ...}) routes through
    run_inverse: the heat diffusivity is identified from oracle-synthesized
    observations and the full UI artifact set is written so the result tabs
    render (SURVEY §2b.13)."""
    from tpinn.core import train

    res = train.run_pinn_training(
        equation="u_t - lam*u_xx",
        boundary={
            "bd_x1_min": 0, "bd_x1_max": 1, "bd_y1_min": 0,
            "bd_y1_max": 0, "bd_u1": "sin(pi*x)",
            "bd_x2_min": 0, "bd_x2_max": 0, "bd_y2_min": 0,
            "bd_y2_max": 0.5, "bd_u2": 0,
            "bd_x3_min": 1, "bd_x3_max": 1, "bd_y3_min": 0,
            "bd_y3_max": 0.5, "bd_u3": 0,
        },
        domain={"x_min": 0, "x_max": 1, "y_min": 0, "y_max": 0.5},
        scl=1, epsil=1,
        sample_points={"n_col": 384, "n_bd": 32, "n_add": 64},
        network_size={"depth": 24, "width": 3},  # UI semantics (swapped)
        testing_size={"x": 24, "y": 24},
        epochs={"adam": 800, "lbfgs": 1200},
        equation_weight={"f": 1.0, "df": 0},
        output_dir=str(tmp_path),
        options={"inverse_params": "lam=0.5", "oracle": "heat_2d",
                 "n_obs": 120},
    )
    rec = json.loads((tmp_path / "inverse.json").read_text())
    assert rec["coef"]["lam"] == pytest.approx(1.0, rel=0.2)
    assert res.rel_l2 is not None and np.isfinite(res.rel_l2)
    # the UI artifact contract: result tabs must have data to render
    for name in ("solution_residual_1.npz", "error_1.npz", "loss_1.npz",
                 "boundary_loss_1.npz", "frequency_spectrum.npz",
                 "collocation_point_1.npz", "params_stage_1.npz"):
        assert (tmp_path / name).exists(), name
    c = np.load(tmp_path / "collocation_point_1.npz")
    assert c["X_col"].shape == (120, 2)  # the observation points


# ---------------------------------------------------------------------------
# Eigenvalue problems (InverseSpec.normalize)
# ---------------------------------------------------------------------------


def _eigen_problem_1d():
    return ProblemSpec(
        name="dirichlet_eigen", equation="u_xx + lam*u", coords=("x",),
        lb=(0.0,), ub=(1.0,),
        bc_groups=(
            sample.BCGroup(lo=(0.0,), hi=(0.0,), value=0.0),
            sample.BCGroup(lo=(1.0,), hi=(1.0,), value=0.0),
        ),
        exact=lambda z: jnp.sin(PI * z),   # mean u² = 1/2 matches the pin
    )


def test_eigen_ground_state():
    """-u'' = lam u, u(0)=u(1)=0: with the mean-square pin replacing
    observations, the joint optimization lands the GROUND eigenpair —
    lam -> pi^2 and u -> sin(pi x) up to sign."""
    prob = _eigen_problem_1d()
    inv = InverseSpec(params=("lam",), init=(8.0,), n_obs=128,
                      normalize=0.5, obs_weight=10.0)
    spec = TrainSpec(
        n_col=256, n_band=0, n_adaptive=0, n_bd=32,
        stages=(StageSpec(depth=3, width=24,
                          adam_epochs=1500, lbfgs_epochs=1500),),
        grid=64, lw=(1.0, 0.0), testing_size=(101,), pad_features=3,
        log_every=500,
    )
    r = run_inverse(prob, inv, spec)
    lam = r.coef["lam"]
    assert abs(lam - PI**2) / PI**2 < 1e-2, lam
    # eigenfunction up to sign: normalized correlation with sin(pi x)
    z = jnp.linspace(0.0, 1.0, 201)[:, None]
    u = np.asarray(r.predict(z))[:, 0]
    s = np.sin(PI * np.asarray(z)[:, 0])
    corr = abs(float(np.dot(u, s))) / (
        np.linalg.norm(u) * np.linalg.norm(s) + 1e-30)
    assert corr > 0.999, corr
    # the amplitude pin held: mean u^2 ~ normalize
    assert abs(float(np.mean(u * u)) - 0.5) < 0.05


@pytest.mark.slow
def test_eigen_second_mode():
    """Initializing lam near 4 pi^2 selects the SECOND eigenpair — the
    identification is local in the spectrum, as designed."""
    prob = _eigen_problem_1d()
    inv = InverseSpec(params=("lam",), init=(40.0,), n_obs=128,
                      normalize=0.5, obs_weight=30.0)
    spec = TrainSpec(
        n_col=384, n_band=0, n_adaptive=0, n_bd=32,
        stages=(StageSpec(depth=3, width=32, scl=2.0,
                          adam_epochs=3000, lbfgs_epochs=3000),),
        grid=64, lw=(1.0, 0.0), testing_size=(101,), pad_features=3,
        log_every=1500,
    )
    r = run_inverse(prob, inv, spec)
    lam = r.coef["lam"]
    assert abs(lam - 4 * PI**2) / (4 * PI**2) < 2e-2, lam
    z = jnp.linspace(0.0, 1.0, 201)[:, None]
    u = np.asarray(r.predict(z))[:, 0]
    s2 = np.sin(2 * PI * np.asarray(z)[:, 0])
    corr = abs(float(np.dot(u, s2))) / (
        np.linalg.norm(u) * np.linalg.norm(s2) + 1e-30)
    assert corr > 0.99, corr
