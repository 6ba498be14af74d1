"""Operator boundary conditions: Neumann / Robin / flux groups.

The reference UI pins boundary VALUES only (Dirichlet, constant per group
— layout.py's bd_u inputs).  BCGroup.operator generalizes a group to pin
any compiled expression of the solution — ``"u_x"`` (Neumann),
``"u_x + k*u"`` (Robin, with the transfer coefficient optionally an
inverse-problem unknown), ``"u_x - v"`` (system flux) — evaluated by the
same forward-mode engine as the interior residual.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.core import sample
from tpinn.core.inverse import InverseSpec, run_inverse
from tpinn.core.system import SystemSpec, run_system
from tpinn.core.train import (ProblemSpec, StageSpec, TrainSpec,
                              run_training)

PI = np.pi


def _poisson_spec(**kw):
    base = dict(
        n_col=256, n_band=0, n_adaptive=64, n_bd=16,
        stages=(StageSpec(depth=3, width=20, scl=1.0, epsil=1.0,
                          adam_epochs=500, lbfgs_epochs=600),),
        grid=64, lw=(1.0, 0.0), testing_size=(201,), pad_features=3,
        tail_max=0, log_every=250,
    )
    base.update(kw)
    return TrainSpec(**base)


def _neumann_problem():
    # u = sin(pi x): Dirichlet u(0)=0, Neumann u_x(1) = pi cos(pi) = -pi
    return ProblemSpec(
        name="poisson_neumann",
        equation="u_xx + pi**2*sin(pi*x)",
        coords=("x",), lb=(0.0,), ub=(1.0,),
        bc_groups=(
            sample.BCGroup(lo=(0.0,), hi=(0.0,), value=0.0),
            sample.BCGroup(lo=(1.0,), hi=(1.0,), value=float(-PI),
                           operator="u_x"),
        ),
        exact=lambda z: jnp.sin(PI * z[:, :1]),
    )


def test_neumann_bc_forward():
    r = run_training(_neumann_problem(), _poisson_spec())
    assert r.rel_l2 < 2e-3


def test_robin_bc_forward():
    # Robin at x=1: u_x + u = -pi + 0 = -pi
    prob = ProblemSpec(
        name="poisson_robin",
        equation="u_xx + pi**2*sin(pi*x)",
        coords=("x",), lb=(0.0,), ub=(1.0,),
        bc_groups=(
            sample.BCGroup(lo=(0.0,), hi=(0.0,), value=0.0),
            sample.BCGroup(lo=(1.0,), hi=(1.0,), value=float(-PI),
                           operator="u_x + u"),
        ),
        exact=lambda z: jnp.sin(PI * z[:, :1]),
    )
    r = run_training(prob, _poisson_spec())
    assert r.rel_l2 < 1e-3


def test_operator_bc_gates_polish():
    # soft operator groups can't feed the Dirichlet-row LSQ polish:
    # "on" errors, "auto" skips with a log and still trains
    prob = _neumann_problem()
    with pytest.raises(ValueError, match="lsq_polish"):
        run_training(prob, _poisson_spec(
            lsq_polish="on",
            stages=(StageSpec(depth=2, width=8,
                              scl=1.0, epsil=1.0,
                              adam_epochs=20, lbfgs_epochs=9),),
        ))
    logs = []
    r = run_training(prob, _poisson_spec(
        lsq_polish="auto", deflation="full",
        stages=(StageSpec(depth=2, width=8, scl=1.0, epsil=1.0,
                          adam_epochs=20, lbfgs_epochs=9),),
    ), log_fn=logs.append)
    assert r.rel_l2 is not None
    assert any("lsq_polish skipped (operator" in m for m in logs)
    assert any("deflation skipped" in m for m in logs)


def test_unknown_robin_coefficient():
    # u = sin(pi x) on [0, 1/2]; Robin at x=1/2: u_x + k*u = 0 + k*1 = k,
    # target 2.0 → the unknown transfer coefficient k has true value 2
    prob = ProblemSpec(
        name="robin_inverse",
        equation="u_xx + pi**2*sin(pi*x)",
        coords=("x",), lb=(0.0,), ub=(0.5,),
        bc_groups=(
            sample.BCGroup(lo=(0.0,), hi=(0.0,), value=0.0),
            sample.BCGroup(lo=(0.5,), hi=(0.5,), value=2.0,
                           operator="u_x + k*u"),
        ),
        exact=lambda z: jnp.sin(PI * z[:, :1]),
    )
    inv = InverseSpec(params=("k",), init=(0.5,), n_obs=80)
    spec = _poisson_spec(
        n_adaptive=0, n_bd=32, tail_max=4000,
        stages=(StageSpec(depth=3, width=20,
                          adam_epochs=600, lbfgs_epochs=1500),),
    )
    r = run_inverse(prob, inv, spec)
    assert abs(r.coef["k"] - 2.0) < 2e-2
    assert r.rel_l2 < 1e-3


def test_system_flux_bc():
    # oscillator system with v(0)=pi stated as the flux u_x(0)=pi
    prob = SystemSpec(
        name="osc_flux",
        equations=("u_x - v", "v_x + pi**2*u"),
        fields=("u", "v"), coords=("x",), lb=(0.0,), ub=(1.0,),
        bc_groups=(
            sample.BCGroup(lo=(0.0,), hi=(0.0,), value=0.0, field=0),
            sample.BCGroup(lo=(0.0,), hi=(0.0,), value=float(PI),
                           operator="u_x"),
            sample.BCGroup(lo=(1.0,), hi=(1.0,), value=0.0, field=0),
        ),
        exact=lambda z: jnp.concatenate(
            [jnp.sin(PI * z[:, :1]), PI * jnp.cos(PI * z[:, :1])], axis=1),
    )
    spec = _poisson_spec(
        tail_max=4000,
        stages=(StageSpec(depth=3, width=24,
                          adam_epochs=600, lbfgs_epochs=900),),
    )
    r = run_system(prob, spec)
    assert r.rel_l2 < 3e-3


def test_elliptic_interface_two_materials():
    """Discontinuous-coefficient (two-material) elliptic interface problem
    — FEM bread-and-butter that vanilla single-net PINNs cannot represent
    (the solution has a derivative JUMP at the interface).  Composed
    entirely from existing machinery: one field per material, each
    material's Laplace residual gated by a sharp tanh indicator inside the
    equation string, and the interface conditions as point groups — value
    continuity ``u − v = 0`` and flux continuity ``κ₁u_x − κ₂v_x = 0`` via
    operator BCs.  κ₁=1, κ₂=10, u(0)=0, u(1)=1: exact flux
    q = 1/(a/κ₁ + (1−a)/κ₂), piecewise-linear solution."""
    k1, k2, a = 1.0, 10.0, 0.5
    q = 1.0 / (a / k1 + (1.0 - a) / k2)

    def exact(z):
        x = z[:, :1]
        u_left = q * x / k1
        u_right = 1.0 + q * (x - 1.0) / k2
        return jnp.concatenate([u_left, u_right], axis=1)

    prob = SystemSpec(
        name="interface_1d",
        equations=(
            f"(0.5 - 0.5*tanh(200*(x - {a})))*u_xx",
            f"(0.5 + 0.5*tanh(200*(x - {a})))*v_xx",
        ),
        fields=("u", "v"), coords=("x",), lb=(0.0,), ub=(1.0,),
        bc_groups=(
            sample.BCGroup(lo=(0.0,), hi=(0.0,), value=0.0, field=0),
            sample.BCGroup(lo=(1.0,), hi=(1.0,), value=1.0, field=1),
            # interface: continuity of value and of flux
            sample.BCGroup(lo=(a,), hi=(a,), value=0.0, operator="u - v"),
            sample.BCGroup(lo=(a,), hi=(a,), value=0.0,
                           operator=f"{k1}*u_x - {k2}*v_x"),
        ),
        exact=exact,
    )
    spec = _poisson_spec(
        stages=(StageSpec(depth=3, width=24,
                          adam_epochs=800, lbfgs_epochs=1200),),
    )
    r = run_system(prob, spec)
    # (rel_l2_fields compares each field on the WHOLE box, including the
    # other material's half where it is ungated — only a loose sanity
    # bound; the physical assertions are branch-restricted below)
    assert r.rel_l2_fields[0] < 2e-2, r.rel_l2_fields
    assert r.rel_l2_fields[1] < 2e-2, r.rel_l2_fields
    # the PHYSICAL solution: u on [0,a], v on [a,1] — derivative jump at a
    z_l = jnp.linspace(0.0, a, 101)[:, None]
    z_r = jnp.linspace(a, 1.0, 101)[:, None]
    u_l = np.asarray(r.predict(z_l))[:, 0]
    v_r = np.asarray(r.predict(z_r))[:, 1]
    np.testing.assert_allclose(u_l, np.asarray(exact(z_l))[:, 0], atol=3e-3)
    np.testing.assert_allclose(v_r, np.asarray(exact(z_r))[:, 1], atol=3e-3)
    # flux continuity held: k1 u'(a-) == k2 v'(a+) == q
    eps = 1e-3
    du = (float(r.predict(jnp.array([[a]]))[0, 0])
          - float(r.predict(jnp.array([[a - eps]]))[0, 0])) / eps
    dv = (float(r.predict(jnp.array([[a + eps]]))[0, 1])
          - float(r.predict(jnp.array([[a]]))[0, 1])) / eps
    assert abs(k1 * du - q) < 0.05 * q
    assert abs(k2 * dv - q) < 0.05 * q
