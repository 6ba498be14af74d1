"""Time-marching (core/march.py): window clipping, IC handoff, the
piecewise composite, serving, and the tiny end-to-end run.

Reference anchor: the reference trains one net over the whole space-time
box (software.py:626-1139); marching is the seq2seq extension it lacks."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from tpinn import problems
from tpinn.core.march import (make_march_predictor, run_time_marching,
                              window_problem)
from tpinn.core.train import StageSpec, TrainSpec


def tiny_spec(**kw):
    return TrainSpec(
        n_col=200, n_band=0, n_adaptive=50, n_bd=40,
        testing_size=(21, 21), grid=21, tail_max=0, pad_features=3,
        stages=(StageSpec(depth=2, width=12, scl=1.0, epsil=1.0,
                          adam_epochs=kw.pop("adam", 120),
                          lbfgs_epochs=kw.pop("lbfgs", 60)),), **kw)


def test_window_problem_clips_and_hands_off():
    p = problems.heat_2d()

    # window 0 keeps the t=0 IC and clips the spatial edges to the slab
    w0 = window_problem(p, 1, 0.0, 0.5, 0, None)
    assert w0.lb == (0.0, 0.0) and w0.ub == (1.0, 0.5)
    assert len(w0.bc_groups) == 3
    assert w0.bc_groups[0].value_expr == "sin(pi*x)"      # IC survives
    assert w0.bc_groups[1].hi == (0.0, 0.5)               # clipped edge

    # window 1 drops the t=0 IC, clips edges, and appends the handoff
    prev = lambda z: jnp.zeros((z.shape[0], 1), z.dtype)
    w1 = window_problem(p, 1, 0.5, 1.0, 1, prev)
    assert w1.lb == (0.0, 0.5) and w1.ub == (1.0, 1.0)
    assert len(w1.bc_groups) == 3                         # 2 edges + handoff
    h = w1.bc_groups[-1]
    assert h.lo == (0.0, 0.5) and h.hi == (1.0, 0.5)
    pts = jnp.asarray([[0.3, 0.5]])
    assert h.target(pts).shape == (1, 1)


def test_march_validation():
    p = problems.heat_2d()
    with pytest.raises(ValueError, match="n_windows"):
        run_time_marching(p, tiny_spec(), 1)
    with pytest.raises(ValueError, match="coordinate"):
        run_time_marching(p, tiny_spec(), 2, axis="z")
    from dataclasses import replace
    hard = replace(p, hard_bc=("sin(pi*x)", "t*x*(1 - x)"))
    with pytest.raises(ValueError, match="hard_bc"):
        run_time_marching(hard, tiny_spec(), 2)


def test_march_predictor_is_piecewise():
    edges = [0.0, 0.5, 1.0]
    fns = [lambda z: jnp.full((z.shape[0], 1), 1.0),
           lambda z: jnp.full((z.shape[0], 1), 2.0)]
    f = make_march_predictor(fns, edges, 1)
    z = jnp.asarray([[0.1, 0.2], [0.1, 0.5], [0.1, 0.9], [0.1, 1.0]])
    out = np.asarray(f(z)).ravel()
    # t=0.5 lands in the UPPER window (searchsorted side='right')
    assert out.tolist() == [1.0, 2.0, 2.0, 2.0]


def test_march_shards_over_points_mesh():
    """Windows train under points-DP sharding (the mesh threads through
    to each window's run_training unchanged)."""
    from tpinn import parallel

    p = problems.heat_2d()
    res = run_time_marching(p, tiny_spec(adam=60, lbfgs=30), 2,
                            mesh=parallel.make_mesh())
    assert np.isfinite(res.rel_l2)


def test_march_through_ui_schema(tmp_path):
    """options.march routes run_pinn_training through time-marching and
    the COMPOSITE's artifact set lands at output_dir's top level (the
    result tabs render a march run like a plain one)."""
    from tpinn.core.train import run_pinn_training

    res = run_pinn_training(
        equation="u_t - u_xx",
        boundary={"bd_x1_min": 0.0, "bd_x1_max": 1.0, "bd_y1_min": 0.0,
                  "bd_y1_max": 0.0, "bd_u1": "sin(pi*x)",
                  "bd_x2_min": 0.0, "bd_x2_max": 0.0, "bd_y2_min": 0.0,
                  "bd_y2_max": 1.0, "bd_u2": 0,
                  "bd_x3_min": 1.0, "bd_x3_max": 1.0, "bd_y3_min": 0.0,
                  "bd_y3_max": 1.0, "bd_u3": 0},
        domain={"x_min": 0.0, "x_max": 1.0, "y_min": 0.0, "y_max": 1.0},
        scl=1.0, epsil=1.0,
        sample_points={"n_col": 200, "n_bd": 50, "n_add": 50},
        network_size={"depth": 12, "width": 2},   # UI swaps the names
        testing_size={"x": 21, "y": 21},
        epochs={"adam": 60, "lbfgs": 30},
        equation_weight={"f": 1.0, "df": 0},
        output_dir=str(tmp_path),
        options={"march": 2},
        exact=lambda z: (jnp.exp(-jnp.pi**2 * z[:, 1:2])
                         * jnp.sin(jnp.pi * z[:, 0:1])),
    )
    assert np.isfinite(res.rel_l2)
    assert (tmp_path / "march.json").exists()
    assert (tmp_path / "solution_residual_1.npz").exists()
    assert (tmp_path / "error_1.npz").exists()
    assert (tmp_path / "window_2" / "params_stage_2.npz").exists()


def test_march_end_to_end_and_serving(tmp_path):
    p = problems.heat_2d()
    res = run_time_marching(p, tiny_spec(), 2, output_dir=str(tmp_path))
    assert np.isfinite(res.rel_l2)
    rec = json.loads((tmp_path / "march.json").read_text())
    assert rec["axis"] == "t" and len(rec["windows"]) == 2
    assert (tmp_path / rec["windows"][1]).exists()

    # composite == window prediction inside each slab
    z = jnp.asarray([[0.4, 0.2], [0.4, 0.8]])
    u = np.asarray(res.predict(z)).ravel()
    u0 = np.asarray(res.windows[0].predict(z)).ravel()
    u1 = np.asarray(res.windows[1].predict(z)).ravel()
    assert u[0] == pytest.approx(u0[0]) and u[1] == pytest.approx(u1[1])

    # serving rebuilds the composite from march.json
    from tpinn.app.serve import PINNServer
    srv = PINNServer(str(tmp_path), problem_name="heat_2d")
    up = srv.predict([[0.4, 0.2], [0.4, 0.8]])
    assert np.allclose(up, u, atol=1e-5)
    r = srv.residual([[0.4, 0.2], [0.4, 0.8]])
    assert np.all(np.isfinite(r))
