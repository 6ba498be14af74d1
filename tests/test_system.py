"""Coupled-system tests: multi-field grammar + end-to-end system training.

The reference is strictly scalar (one hardcoded residual,
software.py:283-297); tpinn.core.system adds first-class coupled systems —
several equations over several fields sharing one multi-output network and
the same optimizer drivers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.core import pde, sample
from tpinn.core.inverse import InverseSpec
from tpinn.core.system import SystemSpec, make_system_loss, run_system
from tpinn.core.train import StageSpec, TrainSpec

PI = np.pi


# ---------------------------------------------------------------------------
# Grammar / compiler
# ---------------------------------------------------------------------------


def test_compile_system_first_order():
    sys_ = pde.compile_system(
        ["u_x - v", "v_x + pi**2*u"], ("x",), ("u", "v")
    )
    assert sys_.n_eq == 2 and sys_.fields == ("u", "v")
    assert sys_.is_linear
    # exact pair u = sin(pi x), v = pi cos(pi x) zeroes both residuals
    f = lambda z: jnp.concatenate(
        [jnp.sin(PI * z), PI * jnp.cos(PI * z)], axis=1
    )
    z = jnp.linspace(0.0, 1.0, 11)[:, None]
    r = sys_.residual(f, z)
    assert r.shape == (11, 2)
    assert float(jnp.abs(r).max()) < 1e-5


def test_compile_system_cauchy_riemann():
    cr = pde.compile_system(
        ["u_x - v_y", "u_y + v_x"], ("x", "y"), ("u", "v")
    )
    # harmonic conjugates u = e^x cos y, v = e^x sin y
    g = lambda z: jnp.concatenate(
        [jnp.exp(z[:, :1]) * jnp.cos(z[:, 1:2]),
         jnp.exp(z[:, :1]) * jnp.sin(z[:, 1:2])], axis=1)
    z = jnp.asarray(np.random.RandomState(0).rand(9, 2), jnp.float32)
    assert float(jnp.abs(cr.residual(g, z)).max()) < 1e-5


def test_system_shares_derivative_passes():
    # union of indices over the equations, computed once for all fields
    sys_ = pde.compile_system(
        ["u_t - v_xx", "v_t - u_xx"], ("x", "t"), ("u", "v")
    )
    assert sys_.indices == frozenset({(1,), (0, 0)})
    assert sys_.max_order == 2


def test_system_grammar_errors():
    # unknown field identifier
    with pytest.raises(pde.PDESyntaxError):
        pde.compile_system(["u_x - w"], ("x",), ("u", "v"))
    # duplicate fields
    with pytest.raises(pde.PDESyntaxError):
        pde.compile_system(["u_x"], ("x",), ("u", "u"))
    # field name colliding with a coordinate
    with pytest.raises(pde.PDESyntaxError):
        pde.compile_system(["u_x"], ("x",), ("u", "x"))
    # multi-character field names work (psi_xx parses)
    s = pde.compile_system(["psi_xx + psi"], ("x",), ("psi",))
    assert s.indices == frozenset({(0, 0), ()})


def test_field_column_mismatch_raises():
    sys_ = pde.compile_system(["u_x - v"], ("x",), ("u", "v"))
    scalar_f = lambda z: jnp.sin(z)  # [N, 1] but the system reads column 1
    with pytest.raises(ValueError, match="out_dim"):
        sys_.residual(scalar_f, jnp.ones((4, 1)))


def test_scalar_grammar_unchanged():
    # default fields=("u",): the scalar path is byte-compatible
    p = pde.compile_pde("u_xx + pi**2*sin(pi*x)", ("x",))
    f_u = lambda z: jnp.sin(PI * z)
    z = jnp.linspace(0.0, 1.0, 7)[:, None]
    assert float(jnp.abs(p.residual(f_u, z)).max()) < 1e-4


def test_bc_group_field_validation():
    with pytest.raises(ValueError, match="field"):
        SystemSpec(
            name="bad", equations=("u_x - v",), fields=("u", "v"),
            coords=("x",), lb=(0.0,), ub=(1.0,),
            bc_groups=(sample.BCGroup(lo=(0.0,), hi=(0.0,), field=2),),
        )


# ---------------------------------------------------------------------------
# End-to-end training
# ---------------------------------------------------------------------------


def _osc_exact(z):
    return jnp.concatenate(
        [jnp.sin(PI * z[:, :1]), PI * jnp.cos(PI * z[:, :1])], axis=1
    )


def test_train_first_order_system():
    # u' = v, v' = -pi^2 u with u(0)=0, v(0)=pi, u(1)=0:
    # u = sin(pi x), v = pi cos(pi x)
    prob = SystemSpec(
        name="osc_system",
        equations=("u_x - v", "v_x + pi**2*u"),
        fields=("u", "v"), coords=("x",), lb=(0.0,), ub=(1.0,),
        bc_groups=(
            sample.BCGroup(lo=(0.0,), hi=(0.0,), value=0.0, field=0),
            sample.BCGroup(lo=(0.0,), hi=(0.0,), value=float(PI), field=1),
            sample.BCGroup(lo=(1.0,), hi=(1.0,), value=0.0, field=0),
        ),
        exact=_osc_exact,
    )
    spec = TrainSpec(
        n_col=256, n_band=0, n_adaptive=64, n_bd=16,
        stages=(StageSpec(depth=3, width=24,
                          adam_epochs=600, lbfgs_epochs=900),),
        grid=64, lw=(1.0, 0.0), testing_size=(201,), pad_features=3,
        log_every=300,
    )
    r = run_system(prob, spec)
    assert r.rel_l2 < 2e-3
    assert len(r.rel_l2_fields) == 2 and max(r.rel_l2_fields) < 3e-3
    # loss_info: 3 + 3 BC groups + 2 equations
    assert r.history.shape[1] == 3 + 3 + 2


def test_train_cauchy_riemann():
    exact = lambda z: jnp.concatenate(
        [jnp.exp(z[:, :1]) * jnp.cos(z[:, 1:2]),
         jnp.exp(z[:, :1]) * jnp.sin(z[:, 1:2])], axis=1)
    edges = []
    for fi in (0, 1):
        fn = (lambda zz, i=fi: exact(zz)[:, i:i + 1])
        edges += [
            sample.BCGroup(lo=(0.0, 0.0), hi=(0.0, 1.0), value_fn=fn, field=fi),
            sample.BCGroup(lo=(1.0, 0.0), hi=(1.0, 1.0), value_fn=fn, field=fi),
            sample.BCGroup(lo=(0.0, 0.0), hi=(1.0, 0.0), value_fn=fn, field=fi),
            sample.BCGroup(lo=(0.0, 1.0), hi=(1.0, 1.0), value_fn=fn, field=fi),
        ]
    prob = SystemSpec(
        name="cauchy_riemann",
        equations=("u_x - v_y", "u_y + v_x"),
        fields=("u", "v"), coords=("x", "y"),
        lb=(0.0, 0.0), ub=(1.0, 1.0),
        bc_groups=tuple(edges), exact=exact,
    )
    spec = TrainSpec(
        n_col=384, n_band=0, n_adaptive=128, n_bd=24,
        stages=(StageSpec(depth=3, width=24,
                          adam_epochs=600, lbfgs_epochs=900),),
        grid=48, lw=(1.0, 0.0), testing_size=(64, 64), pad_features=3,
        log_every=300,
    )
    r = run_system(prob, spec)
    assert r.rel_l2 < 2e-3


def test_inverse_system_identifies_frequency():
    # u' = v, v' = -w2*u with full-state observations: true w2 = pi^2
    prob = SystemSpec(
        name="osc_inverse",
        equations=("u_x - v", "v_x + w2*u"),
        fields=("u", "v"), coords=("x",), lb=(0.0,), ub=(1.0,),
        bc_groups=(
            sample.BCGroup(lo=(0.0,), hi=(0.0,), value=0.0, field=0),
        ),
        exact=_osc_exact,
    )
    inv = InverseSpec(params=("w2",), init=(5.0,), n_obs=80)
    spec = TrainSpec(
        n_col=256, n_band=0, n_adaptive=64, n_bd=16,
        stages=(StageSpec(depth=3, width=24,
                          adam_epochs=600, lbfgs_epochs=900),),
        grid=64, lw=(1.0, 0.0), testing_size=(201,), pad_features=3,
        log_every=300,
    )
    r = run_system(prob, spec, inverse=inv)
    assert abs(r.coef["w2"] - PI**2) / PI**2 < 1e-2
    assert r.rel_l2 < 5e-3
    # loss_info: 3 + 1 BC + 2 obs columns (full state) + 2 equations
    assert r.history.shape[1] == 3 + 1 + 2 + 2


def test_system_loss_info_layout():
    sys_ = pde.compile_system(["u_x - v", "v_x + u"], ("x",), ("u", "v"))
    from tpinn.core import net

    fm = net.feature_map_for(("minmax",), pad_to=3)
    mspec = net.MLPSpec(depth=2, width=8, out_dim=2)
    params = net.init_params(jax.random.PRNGKey(0), mspec, fm, jnp.float32)
    pred = net.make_predictor(mspec, fm, jnp.zeros(1), jnp.ones(1))
    loss_fn = make_system_loss(pred, sys_, bc_fields=(0,))
    data = {
        "x_col": jnp.linspace(0, 1, 16)[:, None],
        "x_bd": [jnp.zeros((4, 1))],
        "u_bd": [jnp.zeros((4, 1))],
    }
    loss_n, info = loss_fn(params, data, jnp.asarray([1.0, 0.0]),
                           jnp.asarray(1.0))
    assert info.shape == (3 + 1 + 2,)
    # loss = loss_data + lw0*loss_eqn; columns consistent
    np.testing.assert_allclose(
        float(info[0]), float(info[1] + info[2]), rtol=1e-6)
    np.testing.assert_allclose(
        float(info[2]), float(info[4] + info[5]), rtol=1e-6)


def test_system_checkpoint_serves(tmp_path):
    """run_system(output_dir=...) writes a self-describing checkpoint;
    serve rebuilds the multi-output predictor with no preset, /predict
    returns one m-column row per point, /residual one column per
    equation."""
    prob = SystemSpec(
        name="osc_system_ckpt",
        equations=("u_x - v", "v_x + pi**2*u"),
        fields=("u", "v"), coords=("x",), lb=(0.0,), ub=(1.0,),
        bc_groups=(
            sample.BCGroup(lo=(0.0,), hi=(0.0,), value=0.0, field=0),
            sample.BCGroup(lo=(0.0,), hi=(0.0,), value=float(PI), field=1),
        ),
        exact=_osc_exact,
    )
    spec = TrainSpec(
        n_col=192, n_band=0, n_adaptive=0, n_bd=16,
        stages=(StageSpec(depth=3, width=16,
                          adam_epochs=200, lbfgs_epochs=90),),
        grid=64, lw=(1.0, 0.0), testing_size=(101,), pad_features=3,
        log_every=200,
    )
    r = run_system(prob, spec, output_dir=str(tmp_path))
    assert (tmp_path / "params_stage_1.npz").exists()
    import json as _json

    rec = _json.loads((tmp_path / "system.json").read_text())
    assert rec["fields"] == ["u", "v"]

    from tpinn.app.serve import PINNServer

    srv = PINNServer(str(tmp_path / "params_stage_1.npz"))  # no preset
    z = np.linspace(0.0, 1.0, 7)[:, None].tolist()
    u_served = np.asarray(srv.predict(z))
    assert u_served.shape == (7, 2)
    u_train = np.asarray(r.predict(jnp.asarray(z, jnp.float32)))
    np.testing.assert_allclose(u_served, u_train, rtol=1e-5, atol=1e-6)
    f = np.asarray(srv.residual(z))
    assert f.shape == (7, 2) and np.all(np.isfinite(f))


# ---------------------------------------------------------------------------
# Navier-Stokes: the Kovasznay benchmark preset
# ---------------------------------------------------------------------------


def test_kovasznay_preset_consistency():
    """The preset's exact fields satisfy its own compiled equations
    (residual ~ 0) and its boundary groups' values match the oracle."""
    from tpinn.core import pde as pde_mod
    from tpinn.problems.systems import get_system

    prob = get_system("kovasznay")
    compiled = pde_mod.compile_system(prob.equations, prob.coords,
                                      prob.fields)
    rng = np.random.RandomState(3)
    z = jnp.asarray(
        prob.lb + rng.rand(256, 2) * (np.asarray(prob.ub) - prob.lb),
        jnp.float32)
    f = compiled.residual(lambda zz: prob.exact(zz), z)
    # f32 second derivatives of e^{lam x}: residual floor ~1e-4
    assert float(jnp.abs(f).max()) < 5e-3
    for g in prob.bc_groups:
        zc = jnp.asarray(np.linspace(g.lo, g.hi, 9), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(g.value_fn(zc))[:, 0],
            np.asarray(prob.exact(zc))[:, g.field], rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_kovasznay_trains():
    """End-to-end steady Navier-Stokes: nonlinear 3-field system through
    the standard drivers at a small CPU budget."""
    from tpinn.core.system import run_system
    from tpinn.problems.systems import get_system

    prob = get_system("kovasznay")
    spec = TrainSpec(
        n_col=1024, n_band=0, n_adaptive=256, n_bd=64,
        testing_size=(48, 48), lw=(1.0, 0.0), grid=48, pad_features=3,
        stages=(StageSpec(depth=4, width=48, scl=1.0, epsil=1.0,
                          adam_epochs=2500, lbfgs_epochs=2500),),
        log_every=1000,
    )
    res = run_system(prob, spec)
    assert res.rel_l2 is not None and np.isfinite(res.rel_l2)
    # velocity fields tight; pressure (one-edge pin) looser
    assert res.rel_l2_fields[0] < 2e-2
    assert res.rel_l2_fields[1] < 5e-2
    assert res.rel_l2_fields[2] < 1e-1


def test_taylor_green_preset_consistency():
    """The Taylor-Green exact fields satisfy the compiled unsteady NS
    system (3 coords: x, y, t) and every face group's trace matches."""
    from tpinn.core import pde as pde_mod
    from tpinn.problems.systems import get_system

    prob = get_system("taylor_green")
    compiled = pde_mod.compile_system(prob.equations, prob.coords,
                                      prob.fields)
    rng = np.random.RandomState(5)
    z = jnp.asarray(
        prob.lb + rng.rand(256, 3) * (np.asarray(prob.ub) - prob.lb),
        jnp.float32)
    f = compiled.residual(lambda zz: prob.exact(zz), z)
    assert float(jnp.abs(f).max()) < 5e-3
    for g in prob.bc_groups:
        zc = jnp.asarray(np.linspace(g.lo, g.hi, 7), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(g.value_fn(zc))[:, 0],
            np.asarray(prob.exact(zc))[:, g.field], rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_taylor_green_trains():
    """Unsteady NS through the 3-coordinate sampler at a tiny CPU budget:
    the system trains and the velocity error lands in the percent class."""
    from tpinn.core.system import run_system
    from tpinn.problems.systems import get_system

    prob = get_system("taylor_green")
    spec = TrainSpec(
        n_col=1536, n_band=0, n_adaptive=256, n_bd=48,
        testing_size=(16, 16, 16), lw=(1.0, 0.0), grid=16, pad_features=0,
        stages=(StageSpec(depth=4, width=48, scl=1.0, epsil=1.0,
                          adam_epochs=2000, lbfgs_epochs=2000),),
        log_every=1000,
    )
    res = run_system(prob, spec)
    assert res.rel_l2 is not None and np.isfinite(res.rel_l2)
    assert res.rel_l2_fields[0] < 5e-2
    assert res.rel_l2_fields[1] < 5e-2


def test_system_testing_size_fallback():
    """A testing_size whose length mismatches the problem dimension (the
    TrainSpec default is 2-D) must not crash the post-training eval — it
    falls back to a per-axis grid of the right rank (regression: the 3-D
    Taylor-Green CLI run crashed in eval_grid after training finished)."""
    from tpinn.core.system import run_system
    from tpinn.problems.systems import get_system

    prob = get_system("taylor_green")
    spec = TrainSpec(
        n_col=128, n_band=0, n_adaptive=0, n_bd=8,
        lw=(1.0, 0.0), grid=8,                 # testing_size left (111, 111)
        stages=(StageSpec(depth=2, width=8, scl=1.0, epsil=1.0,
                          adam_epochs=20, lbfgs_epochs=0),),
        log_every=20,
    )
    lines = []
    res = run_system(prob, spec, log_fn=lines.append)
    assert res.rel_l2 is not None and np.isfinite(res.rel_l2)
    assert any("is not 3-D" in ln for ln in lines)


def test_system_recipes_registry():
    """Every system preset ships a measured recipe whose knobs build a
    valid TrainSpec via the CLI path (mirrors problems.recipes for the
    single-field presets)."""
    from tpinn.problems.systems import SYSTEM_PRESETS, SYSTEM_RECIPES

    assert set(SYSTEM_RECIPES) == set(SYSTEM_PRESETS)
    for name, rec in SYSTEM_RECIPES.items():
        for k in ("adam", "lbfgs", "depth", "width", "n_col",
                  "n_adaptive", "n_bd", "expected_rel_l2", "run_tag"):
            assert k in rec, (name, k)
        assert rec["expected_rel_l2"] < 0.1
