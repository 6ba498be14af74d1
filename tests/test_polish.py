"""float64 L-BFGS polish: runs in a subprocess because enabling jax x64 is
process-global and would poison other tests' dtypes."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

SCRIPT = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, __ROOT__)
import dataclasses
from tpinn import problems
from tpinn.core import train
from tpinn.core.train import StageSpec, TrainSpec

spec = TrainSpec(
    n_col=512, n_band=0, n_adaptive=64, n_bd=64, testing_size=(128,),
    lw=(1.0, 0.0), grid=101,
    stages=(StageSpec(depth=3, width=32, scl=1.0, epsil=1.0,
                      adam_epochs=800, lbfgs_epochs=900),),
    density_every=400, plateau_every=800, tail_max=100,
    lbfgs_dtype="float64",
)
res = train.run_training(problems.poisson_1d(), spec)
# params are cast back to the training dtype after the polish so later
# stages keep uniform carry types
leaf = jax.tree_util.tree_leaves(res.stages[0].params)[0]
print(json.dumps({"rel_l2": res.rel_l2, "dtype": str(leaf.dtype)}))
"""


@pytest.mark.slow
def test_f64_polish_subprocess():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.replace("__ROOT__", repr(str(ROOT)))],
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["dtype"] == "float32"
    # modest budget still reaches well below 1e-3; full budgets reach 8e-6
    assert rec["rel_l2"] < 1e-3, rec


def test_is_linear_detection():
    import jax
    from tpinn.core import pde

    assert pde.compile_pde("u_rr + 1/r*u_r + 1/r**2*u_tt", ("r", "t")).is_linear
    assert pde.compile_pde("u_xx + u_yy + 400*u + sin(x)", ("x", "y")).is_linear
    assert pde.compile_pde("u_t + u*u_x - 0.01*u_xx", ("x", "t")).is_linear is False
    assert pde.compile_pde("u_xx + sin(u)", ("x",)).is_linear is False
    assert pde.compile_pde("u_xx + u**2", ("x",)).is_linear is False
    assert pde.compile_pde("u_t - u_xx/2 + x*u", ("x", "t")).is_linear


LSQ_SCRIPT = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, __ROOT__)
import jax.numpy as jnp
from tpinn.core import deriv, net, pde, polish

# exactness: make the true solution a member of the learned basis span,
# then check the polish recovers it to ~machine precision in one solve
fm = net.feature_map_for((net.MINMAX,))
spec = net.MLPSpec(depth=3, width=16, scl=1.0, epsil=0.7)
key = jax.random.PRNGKey(0)
params_true = net.init_params(key, spec, fm, jnp.float64)
pred = net.make_predictor(spec, fm, jnp.asarray([0.0]), jnp.asarray([1.0]))
u_star = lambda z: pred(params_true, z)

compiled = pde.compile_pde("u_xx", coords=("x",))
source = lambda z: deriv.partials(u_star, z, [(0, 0)])[(0, 0)]

z_col = jnp.linspace(0.0, 1.0, 257, dtype=jnp.float64)[:, None]
z_bd = [jnp.zeros((4, 1), jnp.float64), jnp.ones((4, 1), jnp.float64)]
data = {"x_col": z_col, "x_bd": z_bd, "u_bd": [u_star(z) for z in z_bd]}

# perturb ONLY the last layer; polish must restore it exactly
params0 = jax.tree_util.tree_map(lambda x: x, params_true)
bad_last = {"w": params_true["layers"][-1]["w"] + 0.5,
            "b": params_true["layers"][-1]["b"] - 0.3}
params0 = dict(params0)
params0["layers"] = list(params_true["layers"][:-1]) + [bad_last]

new_params, info = polish.last_layer_lsq(
    pred, compiled, params0, data, lw0=1.0, source_fn=source)
err_w = float(jnp.max(jnp.abs(
    new_params["layers"][-1]["w"] - params_true["layers"][-1]["w"])))
u_err = float(jnp.max(jnp.abs(pred(new_params, z_col) - u_star(z_col))))
print(json.dumps({"pre": info["pre"], "post": info["post"],
                  "applied": info["applied"], "err_w": err_w,
                  "u_err": u_err}))
"""


def test_lsq_polish_exact_recovery():
    code = LSQ_SCRIPT.replace("__ROOT__", repr(str(ROOT)))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["applied"] is True
    assert rec["post"] < 1e-18, rec
    assert rec["err_w"] < 1e-7, rec
    assert rec["u_err"] < 1e-9, rec


HARD_LSQ_SCRIPT = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, __ROOT__)
import jax.numpy as jnp
from tpinn.core import deriv, net, pde, polish

# hard-BC ansatz u = lift + bubble*N: the last-layer subproblem is still
# linear (bubble-scaled features, bubble bias basis, lift in the affine
# part); exact recovery after a last-layer perturbation proves the split.
fm = net.feature_map_for((net.MINMAX,))
spec = net.MLPSpec(depth=3, width=16, scl=1.0, epsil=0.7)
params_true = net.init_params(jax.random.PRNGKey(0), spec, fm, jnp.float64)
raw = net.make_predictor(spec, fm, jnp.asarray([0.0]), jnp.asarray([1.0]))
lift = pde.compile_coord_expr("1 - x", ("x",))
bubble = pde.compile_coord_expr("x*(1 - x)", ("x",))
pred = net.wrap_hard_bc(raw, lift, bubble)
u_star = lambda z: pred(params_true, z)

compiled = pde.compile_pde("u_xx", coords=("x",))
source = lambda z: deriv.partials(u_star, z, [(0, 0)])[(0, 0)]

z_col = jnp.linspace(0.0, 1.0, 257, dtype=jnp.float64)[:, None]
data = {"x_col": z_col, "x_bd": [], "u_bd": []}

params0 = dict(params_true)
params0["layers"] = list(params_true["layers"][:-1]) + [
    {"w": params_true["layers"][-1]["w"] + 0.5,
     "b": params_true["layers"][-1]["b"] - 0.3}]

new_params, info = polish.last_layer_lsq(
    pred, compiled, params0, data, lw0=1.0, source_fn=source)
err_w = float(jnp.max(jnp.abs(
    new_params["layers"][-1]["w"] - params_true["layers"][-1]["w"])))
u_err = float(jnp.max(jnp.abs(pred(new_params, z_col) - u_star(z_col))))
# boundary exactness is structural, but assert anyway
zb = jnp.asarray([[0.0], [1.0]], jnp.float64)
bc_err = float(jnp.max(jnp.abs(pred(new_params, zb) - lift(zb))))
print(json.dumps({"pre": info["pre"], "post": info["post"],
                  "applied": info["applied"], "err_w": err_w,
                  "u_err": u_err, "bc_err": bc_err}))
"""


def test_lsq_polish_hard_bc_exact_recovery():
    code = HARD_LSQ_SCRIPT.replace("__ROOT__", repr(str(ROOT)))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["applied"] is True
    assert rec["post"] < 1e-16, rec
    assert rec["err_w"] < 1e-6, rec
    assert rec["u_err"] < 1e-8, rec
    assert rec["bc_err"] == 0.0, rec


def test_resonant_deflation_recovers_planted_mode():
    """A solution contaminated with a known resonance-ring mode is cleaned
    by the residual-only estimator: u = u* + c·sin(4πx)sin(5πy) under
    L = Δ + k², k=20 (λ_45 = 41π² ≈ 404.6, ε ≈ −4.6)."""
    import numpy as np
    import jax.numpy as jnp
    from tpinn.core import pde, polish

    k = 20.0
    eq = f"u_xx + u_yy + {k*k}*u + {k*k}*sin({k}*x)*sin({k}*y)"
    compiled = pde.compile_pde(eq, ("x", "y"))
    c_true = 1.3e-3

    def predictor(params, z):
        x, y = z[:, 0:1], z[:, 1:2]
        return (jnp.sin(k * x) * jnp.sin(k * y)
                + c_true * jnp.sin(4 * jnp.pi * x) * jnp.sin(5 * jnp.pi * y))

    defl = polish.resonant_deflation(
        predictor, {}, compiled, (0.0, 0.0), (1.0, 1.0),
        n_grid=81, max_mode=8)
    assert defl is not None
    got = dict(zip(map(tuple, defl["modes"]), defl["coeffs"]))
    assert (4, 5) in got
    assert got[(4, 5)] == pytest.approx(c_true, rel=0.05)
    # every other band coefficient is noise-level
    assert all(abs(v) < 0.05 * c_true for m, v in got.items() if m != (4, 5))
    # term/fields consistency: subtracting the term removes the mode
    import numpy as np
    z = np.random.default_rng(0).uniform(0, 1, (500, 2))
    term = polish.deflation_term(defl)
    du, _ = polish.deflation_fields(defl, compiled, z)
    assert np.allclose(np.asarray(term(jnp.asarray(z))), du, atol=1e-6)
    err0 = c_true * np.sin(4 * np.pi * z[:, :1]) * np.sin(5 * np.pi * z[:, 1:])
    assert np.abs(err0 - du).max() < 0.06 * c_true


def test_resonant_deflation_singular_mode_skipped():
    """An EXACTLY-resonant operator (c₀ = 5π², so modes (1,2)/(2,1) are in
    L's null space, ε = 0 to rounding) must never divide by ε: the band
    path either skips the singular modes (returning None when nothing else
    is in the band) or returns finite coefficients — no Inf/NaN baked into
    u*, the checkpoint meta, or serving (ADVICE r3, medium)."""
    import numpy as np
    import jax.numpy as jnp
    from tpinn.core import pde, polish

    c0 = 5 * float(np.pi) ** 2                        # λ(1,2) exactly
    compiled = pde.compile_pde(f"u_xx + u_yy + {c0!r}*u", ("x", "y"))

    def predictor(params, z):                          # nonzero residual
        x, y = z[:, 0:1], z[:, 1:2]
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y) * (1 + 0.1 * x)

    defl = polish.resonant_deflation(
        predictor, {}, compiled, (0.0, 0.0), (1.0, 1.0),
        n_grid=61, max_mode=4)
    if defl is not None:
        assert all(np.isfinite(c) and abs(c) < 1e3 for c in defl["coeffs"]), \
            defl["coeffs"]
        assert all(abs(e) > 1e-6 for e in defl["eps"]), defl["eps"]

    # shifting c₀ off the eigenvalue by 1 puts (1,2)/(2,1) near-resonant but
    # well-conditioned (ε = ±1): they must be deflated, finitely
    defl2 = polish.resonant_deflation(
        predictor, {}, pde.compile_pde(f"u_xx + u_yy + {c0 + 1.0!r}*u",
                                       ("x", "y")),
        (0.0, 0.0), (1.0, 1.0), n_grid=61, max_mode=4)
    assert defl2 is not None
    got = dict(zip(map(tuple, defl2["modes"]), defl2["coeffs"]))
    assert (1, 2) in got and (2, 1) in got
    assert all(np.isfinite(c) for c in defl2["coeffs"])


def test_resonant_deflation_inert_where_invalid():
    """Non-diagonal operators (heat's ∂t) and c₀-free operators (Poisson)
    select nothing — the deflation is safe to leave on 'auto'."""
    import jax.numpy as jnp
    from tpinn.core import pde, polish

    pred = lambda params, z: jnp.sin(jnp.pi * z[:, 0:1]) * (1 - z[:, 1:2])
    heat = pde.compile_pde("u_t - u_xx + 100*u", ("x", "t"))
    assert polish.resonant_deflation(
        pred, {}, heat, (0.0, 0.0), (1.0, 1.0), n_grid=41, max_mode=5) is None
    poisson = pde.compile_pde("u_xx + u_yy", ("x", "y"))
    assert polish.resonant_deflation(
        pred, {}, poisson, (0.0, 0.0), (1.0, 1.0), n_grid=41,
        max_mode=5) is None


def test_full_defect_correction_elliptic():
    """Planted smooth error under Poisson + hard-BC: the full-band
    inversion e = L⁻¹r recovers it from the residual alone."""
    import numpy as np
    import jax.numpy as jnp
    from tpinn.core import pde, polish

    eq = "u_xx + u_yy + 2*pi**2*sin(pi*x)*sin(pi*y)"
    compiled = pde.compile_pde(eq, ("x", "y"))
    c_true = 2.7e-4

    def predictor(params, z):
        x, y = z[:, 0:1], z[:, 1:2]
        return (jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y)
                + c_true * jnp.sin(2 * jnp.pi * x) * jnp.sin(3 * jnp.pi * y))

    defl = polish.defect_correction(
        predictor, {}, compiled, (0.0, 0.0), (1.0, 1.0),
        hard_bc=("0", "x*(1 - x)*y*(1 - y)"), mode="full",
        coords=("x", "y"), n_grid=61, max_mode=6)
    assert defl is not None and defl["kind"] == "modal"
    got = dict(zip(map(tuple, defl["modes"]), defl["coeffs"]))
    assert got[(2, 3)] == pytest.approx(c_true, rel=0.03)
    z = np.random.default_rng(1).uniform(0, 1, (400, 2))
    du, _ = polish.deflation_fields(defl, compiled, z)
    g = c_true * np.sin(2 * np.pi * z[:, :1]) * np.sin(3 * np.pi * z[:, 1:])
    assert np.abs(du - g).max() < 0.05 * c_true


def test_full_defect_correction_parabolic():
    """Planted error with zero IC/BC under the heat operator: the
    per-mode Duhamel march reconstructs it from the residual."""
    import numpy as np
    import jax.numpy as jnp
    from tpinn.core import pde, polish

    compiled = pde.compile_pde("u_t - u_xx", ("x", "t"))
    c_true = 8e-4

    def predictor(params, z):
        x, t = z[:, 0:1], z[:, 1:2]
        u_star = jnp.exp(-jnp.pi ** 2 * t) * jnp.sin(jnp.pi * x)
        g = c_true * jnp.sin(2 * jnp.pi * x) * (1 - jnp.exp(-3 * t))
        return u_star + g

    defl = polish.defect_correction(
        predictor, {}, compiled, (0.0, 0.0), (1.0, 1.0),
        hard_bc=("sin(pi*x)", "t*x*(1 - x)"), mode="full",
        coords=("x", "t"), n_grid=121, max_mode=6)
    assert defl is not None and defl["kind"] == "parabolic"
    z = np.random.default_rng(2).uniform(0, 1, (400, 2))
    du, df = polish.deflation_fields(defl, compiled, z)
    g = (c_true * np.sin(2 * np.pi * z[:, :1])
         * (1 - np.exp(-3 * z[:, 1:])))
    assert np.abs(du - g).max() < 0.04 * c_true
    # the jnp term agrees with the numpy fields
    term = polish.deflation_term(defl)
    assert np.allclose(np.asarray(term(jnp.asarray(z))), du, atol=1e-6)


def test_full_defect_requires_vanishing_bubble():
    """mode='full' refuses when the bubble does not vanish on a
    constrained face (soft-BC error would leak through the inversion)."""
    import jax.numpy as jnp
    from tpinn.core import pde, polish

    compiled = pde.compile_pde("u_xx + u_yy + 2*u", ("x", "y"))
    pred = lambda p, z: jnp.sin(jnp.pi * z[:, 0:1]) * z[:, 1:2]
    assert polish.defect_correction(
        pred, {}, compiled, (0.0, 0.0), (1.0, 1.0),
        hard_bc=("0", "x*(1 - x)"),   # nonzero on the y faces
        mode="full", coords=("x", "y"), n_grid=41, max_mode=4) is None
    assert polish.defect_correction(
        pred, {}, compiled, (0.0, 0.0), (1.0, 1.0),
        hard_bc=None, mode="full", coords=("x", "y")) is None

def test_parabolic_antidiffusive_guard_is_cumulative():
    """A strongly anti-diffusive reaction term (u_t - u_xx - c*u with
    c >> pi^2) makes the per-mode integrating factor GROW along the march;
    the guard must bound cumulative growth over the whole interval, so
    every such mode is dropped and any returned series stays finite."""
    import numpy as np
    import jax.numpy as jnp
    from tpinn.core import pde, polish

    compiled = pde.compile_pde("u_t - u_xx - 800*u", ("x", "t"))

    def predictor(params, z):
        x, t = z[:, 0:1], z[:, 1:2]
        return (jnp.sin(jnp.pi * x) * (1 + 0.1 * t)
                + 3e-4 * jnp.sin(2 * jnp.pi * x) * t)

    defl = polish.parabolic_defect(
        predictor, {}, compiled, (0.0, 0.0), (1.0, 1.0),
        n_grid=81, max_mode=6)
    if defl is not None:
        # modes with mu/a ~ pi^2 m^2 - 800 < -30 over a unit march must be
        # gone; whatever survives must be finite (no exp overflow)
        for m, mu in zip(defl["modes"], defl["mu"]):
            assert mu / defl["a"] * 1.0 >= -30.0, (m, mu)
        assert np.isfinite(np.asarray(defl["series"], dtype=float)).all()


def test_bubble_face_check_is_relative():
    """An O(100)-amplitude bubble evaluates to ~1e-5 f32 roundoff on a
    true zero face; the f64 relative check must still accept it."""
    import jax.numpy as jnp
    from tpinn.core import pde, polish

    compiled = pde.compile_pde("u_xx + u_yy + 2*u", ("x", "y"))
    pred = lambda p, z: jnp.zeros((z.shape[0], 1), z.dtype)
    defl = polish.defect_correction(
        pred, {}, compiled, (0.0, 0.0), (1.0, 1.0),
        hard_bc=("0", "100*sin(pi*x)*y*(1 - y)"),
        mode="full", coords=("x", "y"), n_grid=41, max_mode=3)
    # zero residual -> no modes survive the projection, but the bubble
    # check must NOT be the reason for rejection: a scaled copy of a
    # valid bubble with a real planted error must be corrected
    c_true = 2.7e-4

    def pred2(params, z):
        x, y = z[:, 0:1], z[:, 1:2]
        return c_true * jnp.sin(2 * jnp.pi * x) * jnp.sin(3 * jnp.pi * y)

    defl2 = polish.defect_correction(
        pred2, {}, compiled, (0.0, 0.0), (1.0, 1.0),
        hard_bc=("0", "100*x*(1 - x)*y*(1 - y)"),
        mode="full", coords=("x", "y"), n_grid=61, max_mode=6)
    assert defl2 is not None, "large-amplitude bubble falsely rejected"


def test_defect_correction_full_accepts_band_kwarg():
    """The documented band knob must pass through mode='full' without a
    TypeError (it is fixed to 'full' internally)."""
    import jax.numpy as jnp
    from tpinn.core import pde, polish

    compiled = pde.compile_pde("u_xx + u_yy + 2*u", ("x", "y"))
    pred = lambda p, z: jnp.zeros((z.shape[0], 1), z.dtype)
    polish.defect_correction(
        pred, {}, compiled, (0.0, 0.0), (1.0, 1.0),
        hard_bc=("0", "x*(1 - x)*y*(1 - y)"), mode="full",
        coords=("x", "y"), n_grid=41, max_mode=3, band=0.5)

def test_galerkin_defect_annulus_planted():
    """Variable-coefficient operator (polar Laplace on the annulus, sine
    modes NOT eigenmodes) with a periodic θ axis: the Galerkin solve must
    recover a planted mixed-basis error from the residual alone —
    the case the diagonal full-band path cannot serve."""
    import numpy as np
    import jax.numpy as jnp
    from tpinn.core import pde, polish

    two_pi = float(2 * np.pi)
    compiled = pde.compile_pde("u_rr + 1/r*u_r + 1/r**2*u_tt", ("r", "t"))
    c1, c2 = 3.1e-4, -1.7e-4

    def predictor(params, z):
        r, t = z[:, 0:1], z[:, 1:2]
        s = jnp.pi * (r - 0.1) / 0.9
        return (jnp.log(r) / jnp.log(0.1)
                + c1 * jnp.sin(s)
                + c2 * jnp.sin(2 * s) * jnp.cos(t))

    defl = polish.defect_correction(
        predictor, {}, compiled, (0.1, 0.0), (1.0, two_pi),
        hard_bc=("(1 - r)/0.9", "(r - 0.1)*(1 - r)"), mode="full",
        coords=("r", "t"), n_grid=81, max_sin=6, max_fourier=3)
    assert defl is not None and defl["kind"] == "galerkin"
    got = {tuple(map(tuple, m)): c
           for m, c in zip(defl["modes"], defl["coeffs"])}
    assert got[(("sin", 1), ("one", 0))] == pytest.approx(c1, rel=0.02)
    assert got[(("sin", 2), ("pcos", 1))] == pytest.approx(c2, rel=0.02)

    # field adjustment and serving term agree with the planted error
    rng = np.random.default_rng(3)
    z = rng.uniform(0, 1, (300, 2))
    z[:, 0] = 0.1 + 0.9 * z[:, 0]
    z[:, 1] *= two_pi
    du, _ = polish.deflation_fields(defl, compiled, z)
    s = np.pi * (z[:, :1] - 0.1) / 0.9
    g = c1 * np.sin(s) + c2 * np.sin(2 * s) * np.cos(z[:, 1:])
    assert np.abs(du - g).max() < 0.05 * max(abs(c1), abs(c2))
    term = polish.deflation_term(defl)
    assert np.allclose(np.asarray(term(jnp.asarray(z))), du, atol=1e-6)


def test_galerkin_defect_rejects_nonperiodic_axis():
    """A predictor that is NOT periodic on the free axis must fail the
    face certificate — a Fourier basis cannot carry its error."""
    import numpy as np
    import jax.numpy as jnp
    from tpinn.core import pde, polish

    two_pi = float(2 * np.pi)
    compiled = pde.compile_pde("u_rr + 1/r*u_r + 1/r**2*u_tt", ("r", "t"))

    def predictor(params, z):
        r, t = z[:, 0:1], z[:, 1:2]
        return jnp.log(r) / jnp.log(0.1) + 1e-3 * t * (r - 0.1) * (1 - r)

    assert polish.defect_correction(
        predictor, {}, compiled, (0.1, 0.0), (1.0, two_pi),
        hard_bc=("(1 - r)/0.9", "(r - 0.1)*(1 - r)"), mode="full",
        coords=("r", "t"), n_grid=61, max_sin=4, max_fourier=2) is None

def test_galerkin_newton_defect_nonlinear_burgers():
    """NONLINEAR operator (Burgers): the Galerkin solve linearizes the
    residual at the trained solution (one Newton step) and must recover
    a planted error with zero data at x=±1 and t=0 — march basis on the
    initial-value axis.  u* = x/(1+t) solves u_t + u·u_x − ν·u_xx
    exactly (u_xx = 0)."""
    import numpy as np
    import jax.numpy as jnp
    from tpinn.core import pde, polish

    compiled = pde.compile_pde("u_t + u*u_x - 0.01*u_xx", ("x", "t"))
    assert not compiled.is_linear
    c_true = 4e-4

    def predictor(params, z):
        x, t = z[:, 0:1], z[:, 1:2]
        g = (c_true * jnp.sin(jnp.pi * (x + 1) / 2)
             * jnp.sin(jnp.pi * t / 2))
        return x / (1 + t) + g

    defl = polish.defect_correction(
        predictor, {}, compiled, (-1.0, 0.0), (1.0, 1.0),
        hard_bc=("x", "t*(1 - x**2)"), mode="full",
        coords=("x", "t"), n_grid=61, max_sin=5)
    assert defl is not None and defl["kind"] == "galerkin"
    assert defl.get("linearized") is True
    got = {tuple(map(tuple, m)): c
           for m, c in zip(defl["modes"], defl["coeffs"])}
    # Newton-step accuracy: exact to O(c_true) relative (quadratic term)
    assert got[(("sin", 1), ("msin", 1))] == pytest.approx(c_true, rel=0.02)

    z = np.random.default_rng(5).uniform(0, 1, (300, 2))
    z[:, 0] = 2 * z[:, 0] - 1
    du, df = polish.deflation_fields(defl, compiled, z)
    assert df is None            # nonlinear: no affine field adjustment
    g = (c_true * np.sin(np.pi * (z[:, :1] + 1) / 2)
         * np.sin(np.pi * z[:, 1:] / 2))
    assert np.abs(du - g).max() < 0.05 * c_true

def test_soft_defect_recovers_boundary_carrying_error():
    """Soft-BC correction: a planted smooth error with NONZERO boundary
    trace is determined by residual rows + known boundary data (e = u − g
    on the Dirichlet groups) in the Chebyshev basis — the case every
    hard-BC family must reject."""
    import numpy as np
    import jax.numpy as jnp
    from tpinn.core import pde, polish, sample

    # L = Δ + 30 with the manufactured source for u* = sin(πx)sin(πy)
    compiled = pde.compile_pde(
        "u_xx + u_yy + 30*u - (30 - 2*pi**2)*sin(pi*x)*sin(pi*y)",
        ("x", "y"))

    def err(x, y, xp):
        return 5e-4 * (x * x * y + 0.5 * xp.cos(2 * y) * x - 0.3)

    def predictor(params, z):
        x, y = z[:, 0:1], z[:, 1:2]
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y) + err(x, y, jnp)

    groups = (
        sample.BCGroup(lo=(0.0, 0.0), hi=(0.0, 1.0), value=0.0),
        sample.BCGroup(lo=(1.0, 0.0), hi=(1.0, 1.0), value=0.0),
        sample.BCGroup(lo=(0.0, 0.0), hi=(1.0, 0.0), value=0.0),
        sample.BCGroup(lo=(0.0, 1.0), hi=(1.0, 1.0), value=0.0),
    )
    defl = polish.defect_correction(
        predictor, {}, compiled, (0.0, 0.0), (1.0, 1.0),
        hard_bc=None, mode="full", coords=("x", "y"),
        bc_groups=groups, n_grid=61, degree=10)
    assert defl is not None and defl.get("soft") is True

    z = np.random.default_rng(7).uniform(0, 1, (400, 2))
    du, df = polish.deflation_fields(defl, compiled, z)
    g = err(z[:, :1], z[:, 1:], np)
    scale = np.abs(g).max()
    assert np.abs(du - g).max() < 0.03 * scale
    # serving term matches the field adjustment
    term = polish.deflation_term(defl)
    assert np.allclose(np.asarray(term(jnp.asarray(z))), du, atol=1e-6)

def test_soft_defect_degree_auto_selects_and_recovers():
    """degree="auto": the held-out ladder picks a degree from the
    candidate set, records it, and recovers the planted error at least
    as well as the test's hand-picked fixed degree."""
    import numpy as np
    import jax.numpy as jnp
    from tpinn.core import pde, polish, sample

    compiled = pde.compile_pde(
        "u_xx + u_yy + 30*u - (30 - 2*pi**2)*sin(pi*x)*sin(pi*y)",
        ("x", "y"))

    def err(x, y, xp):
        return 5e-4 * (x * x * y + 0.5 * xp.cos(2 * y) * x - 0.3)

    def predictor(params, z):
        x, y = z[:, 0:1], z[:, 1:2]
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y) + err(x, y, jnp)

    groups = (
        sample.BCGroup(lo=(0.0, 0.0), hi=(0.0, 1.0), value=0.0),
        sample.BCGroup(lo=(1.0, 0.0), hi=(1.0, 1.0), value=0.0),
        sample.BCGroup(lo=(0.0, 0.0), hi=(1.0, 0.0), value=0.0),
        sample.BCGroup(lo=(0.0, 1.0), hi=(1.0, 1.0), value=0.0),
    )
    defl = polish.defect_correction(
        predictor, {}, compiled, (0.0, 0.0), (1.0, 1.0),
        hard_bc=None, mode="full", coords=("x", "y"),
        bc_groups=groups, n_grid=61, degree="auto")
    assert defl is not None and defl.get("soft") is True
    assert defl["degree"] in (8, 12, 16, 20, 24)

    z = np.random.default_rng(7).uniform(0, 1, (400, 2))
    du, _ = polish.deflation_fields(defl, compiled, z)
    g = err(z[:, :1], z[:, 1:], np)
    scale = np.abs(g).max()
    assert np.abs(du - g).max() < 0.03 * scale


def test_soft_defect_ring_augmentation_recovers_resonant_mode():
    """Resonance-band sine columns (soft_defect ring=True, the default)
    carry the near-null-space error a truncated Chebyshev basis cannot:
    a planted sin(8πx)sin(8πy) mode of L = Δ + 1200 (ε = 1200 − 128π² =
    −63, well inside the 0.35·c₀ band) needs polynomial degree ≳ 25,
    far above the fixed degree-12 candidate — the ring column recovers
    it exactly.  Without the ring the same fixed-degree solve must leave
    the resonant content behind."""
    import numpy as np
    import jax.numpy as jnp
    from tpinn.core import pde, polish, sample

    # manufactured: u* = sin(pi x)sin(pi y) solves L u = f with
    # f = (1200 - 2 pi^2) sin(pi x)sin(pi y)
    compiled = pde.compile_pde(
        "u_xx + u_yy + 1200*u - (1200 - 2*pi**2)*sin(pi*x)*sin(pi*y)",
        ("x", "y"))

    amp_s, amp_r = 3e-4, 5e-4

    def err(x, y, xp):
        smooth = amp_s * (x * x * y - 0.4 * x + 0.1)
        ring = amp_r * xp.sin(8 * xp.pi * x) * xp.sin(8 * xp.pi * y)
        return smooth + ring

    def predictor(params, z):
        x, y = z[:, 0:1], z[:, 1:2]
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y) + err(x, y, jnp)

    groups = (
        sample.BCGroup(lo=(0.0, 0.0), hi=(0.0, 1.0), value=0.0),
        sample.BCGroup(lo=(1.0, 0.0), hi=(1.0, 1.0), value=0.0),
        sample.BCGroup(lo=(0.0, 0.0), hi=(1.0, 0.0), value=0.0),
        sample.BCGroup(lo=(0.0, 1.0), hi=(1.0, 1.0), value=0.0),
    )
    defl = polish.soft_defect(
        predictor, {}, compiled, (0.0, 0.0), (1.0, 1.0), groups,
        n_grid=61, degree=12, ring_max_mode=8)
    assert defl is not None and defl.get("ring", 0) > 0

    z = np.random.default_rng(7).uniform(0, 1, (400, 2))
    du, _ = polish.deflation_fields(defl, compiled, z)
    g = err(z[:, :1], z[:, 1:], np)
    assert np.abs(du - g).max() < 0.05 * np.abs(g).max()

    # ablation: the pure-Chebyshev solve at the same degree cannot carry
    # the resonant mode — it either fails the guard or leaves >=40% of
    # the planted ring amplitude behind
    off = polish.soft_defect(
        predictor, {}, compiled, (0.0, 0.0), (1.0, 1.0), groups,
        n_grid=61, degree=12, ring=False)
    if off is not None:
        du0, _ = polish.deflation_fields(off, compiled, z)
        assert np.abs(du0 - g).max() > 0.4 * amp_r


def test_ring_penalty_setup_amplifies_band_modes():
    """ring_penalty_setup turns the deflation identity into a loss-visible
    operator: for a planted ring-mode error of coefficient δ, the penalty
    ‖Pᵀr‖² recovers δ² (the MEAN-SQUARE SOLUTION error) even though the
    residual it sees is only ε·δ·v — while broadband residual content maps
    to ~nothing."""
    import numpy as np
    from tpinn.core import pde, polish

    compiled = pde.compile_pde("u_xx + u_yy + 1200*u", ("x", "y"))
    setup = polish.ring_penalty_setup(compiled, (0.0, 0.0), (1.0, 1.0),
                                      n_grid=64, max_mode=10)
    assert setup is not None
    z, P = setup
    assert z.shape[1] == 2 and P.shape[0] == z.shape[0] and P.shape[1] >= 1

    x, y = z[:, 0:1], z[:, 1:2]
    v_hat = 2.0 * np.sin(8 * np.pi * x) * np.sin(8 * np.pi * y)  # ⟨v̂,v̂⟩=1
    eps = 1200.0 - 128.0 * np.pi**2                              # ≈ -63.1
    delta = 3e-4
    r_ring = delta * eps * v_hat        # residual of u* + δ·v̂
    pen = float(np.sum((P.T @ r_ring) ** 2))
    assert pen == pytest.approx(delta**2, rel=0.05)

    # broadband content of the SAME residual norm barely registers:
    # the penalty is a ring-error meter, not another residual MSE
    r_flat = np.full_like(r_ring, float(np.sqrt(np.mean(r_ring**2))))
    pen_flat = float(np.sum((P.T @ r_flat) ** 2))
    assert pen_flat < 1e-3 * pen


def test_ring_penalty_inert_cases():
    from tpinn.core import pde, polish

    # no zeroth-order coefficient (Poisson): no resonance scale
    assert polish.ring_penalty_setup(
        pde.compile_pde("u_xx + u_yy", ("x", "y")),
        (0.0, 0.0), (1.0, 1.0), n_grid=32, max_mode=6) is None
    # nonlinear operator
    assert polish.ring_penalty_setup(
        pde.compile_pde("u*u_x + u_xx + 100*u", ("x",)),
        (0.0,), (1.0,), n_grid=32, max_mode=6) is None
    # first-order term breaks sine diagonality (heat-like)
    assert polish.ring_penalty_setup(
        pde.compile_pde("u_t - u_xx + 40*u", ("x", "t")),
        (0.0, 0.0), (1.0, 1.0), n_grid=32, max_mode=6) is None


def test_ring_penalty_trains(tmp_path):
    """TrainSpec.ring_weight wires the penalty through the stage loss:
    the run logs the band-mode count and converges on a small Helmholtz."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from tpinn.core import sample, train
    from tpinn.core.train import ProblemSpec, StageSpec, TrainSpec

    prob = ProblemSpec(
        name="helm_ring", coords=("x", "y"),
        equation="u_xx + u_yy + 25*u - (25 - 2*pi**2)*sin(pi*x)*sin(pi*y)",
        lb=(0.0, 0.0), ub=(1.0, 1.0),
        bc_groups=(
            sample.BCGroup(lo=(0.0, 0.0), hi=(0.0, 1.0), value=0.0),
            sample.BCGroup(lo=(1.0, 0.0), hi=(1.0, 1.0), value=0.0),
            sample.BCGroup(lo=(0.0, 0.0), hi=(1.0, 0.0), value=0.0),
            sample.BCGroup(lo=(0.0, 1.0), hi=(1.0, 1.0), value=0.0),
        ),
        exact=lambda z: jnp.sin(jnp.pi * z[:, 0:1]) * jnp.sin(jnp.pi * z[:, 1:2]),
    )
    spec = TrainSpec(
        n_col=256, n_band=0, n_adaptive=64, n_bd=24, testing_size=(32, 32),
        lw=(1.0, 0.0), grid=41, ring_weight=1.0, pad_features=3,
        stages=(StageSpec(depth=2, width=16, scl=1.0, epsil=1.0,
                          adam_epochs=300, lbfgs_epochs=150),),
        log_every=300,
    )
    lines = []
    res = train.run_training(prob, spec, log_fn=lines.append)
    assert any("ring penalty on 1 band modes" in ln for ln in lines), lines
    assert res.rel_l2 is not None and np.isfinite(res.rel_l2)
