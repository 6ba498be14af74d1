"""N-dimensional (d ≥ 3) support: samplers, smoothing, end-to-end 3-D.

The reference pipeline is strictly 2-D (its sampler hardcodes a 111×111
grid and the app's domain inputs are x/y only, software.py:522-532);
tpinn generalizes the same uniform + boundary-band + residual-adaptive
pipeline over any dimension (sample.make_sampler_nd / inverse_cdf_nd /
gaussian_smooth_nd), with the 2-D figure-artifact contract skipped for
d ≥ 3 (metrics and checkpoints unchanged).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.core import sample
from tpinn.core.train import ProblemSpec, StageSpec, TrainSpec, run_training

PI = np.pi


def test_inverse_cdf_nd_targets_density():
    # delta-like density on one cell: every draw lands inside that cell
    g = 9
    axes = [jnp.linspace(0.0, 1.0, g) for _ in range(3)]
    F = jnp.zeros((g, g, g)).at[2, 5, 7].set(1.0)
    pts = sample.inverse_cdf_nd(jax.random.PRNGKey(0), axes, F, 256)
    assert pts.shape == (256, 3)
    h = 1.0 / (g - 1)
    lo = np.array([2 * h, 5 * h, 7 * h])
    assert np.all(np.asarray(pts) >= lo - 1e-6)
    assert np.all(np.asarray(pts) <= lo + h + 1e-6)


def test_inverse_cdf_nd_uniform_marginals():
    g = 17
    axes = [jnp.linspace(0.0, 1.0, g) for _ in range(3)]
    F = jnp.ones((g, g, g))
    pts = np.asarray(
        sample.inverse_cdf_nd(jax.random.PRNGKey(1), axes, F, 4096))
    # uniform density → near-uniform marginals
    for i in range(3):
        assert abs(pts[:, i].mean() - 0.5) < 0.03
        assert pts[:, i].min() >= 0.0 and pts[:, i].max() <= 1.0 + 1e-6


def test_gaussian_smooth_nd_matches_2d():
    F = jnp.asarray(np.random.RandomState(0).rand(21, 21), jnp.float32)
    a = sample.gaussian_smooth_2d(F, (1.0, 1.0), (5, 5))
    b = sample.gaussian_smooth_nd(F, 1.0, 5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_boundary_band_nd():
    g = 21
    axes = [jnp.linspace(0.0, 1.0, g) for _ in range(3)]
    grids = jnp.meshgrid(*axes, indexing="ij")
    F = sample.boundary_band_density_nd(grids, jnp.zeros(3), jnp.ones(3))
    Fn = np.asarray(F)
    assert Fn[0, 10, 10] == 1.0 and Fn[10, 10, 0] == 1.0  # faces
    assert Fn[10, 10, 10] == 0.0                          # center
    assert Fn[0, 0, 0] == 1.0                             # corner


def test_sampler_for_dispatch():
    cfg = sample.SamplerConfig(n_col=32, n_band=8, n_adaptive=8, n_bd=4,
                               grid=9)
    for d in (1, 2, 3, 4):
        fn, grids = sample.sampler_for(cfg, (), [0.0] * d, [1.0] * d)
        data = fn(jax.random.PRNGKey(0), jnp.ones_like(grids[0]))
        assert data["x_col"].shape[1] == d
        # 1-D folds band+adaptive into one draw; counts still land
        assert data["x_col"].shape[0] == 32 + 8 + 8


def _poisson_3d(hard=True):
    exact = lambda z: (jnp.sin(PI * z[:, :1]) * jnp.sin(PI * z[:, 1:2])
                       * jnp.sin(PI * z[:, 2:3]))
    groups = ()
    if not hard:
        groups = tuple(
            sample.BCGroup(lo=tuple(lo), hi=tuple(hi), value=0.0)
            for lo, hi in [
                ((0, 0, 0), (0, 1, 1)), ((1, 0, 0), (1, 1, 1)),
                ((0, 0, 0), (1, 0, 1)), ((0, 1, 0), (1, 1, 1)),
                ((0, 0, 0), (1, 1, 0)), ((0, 0, 1), (1, 1, 1)),
            ]
        )
    return ProblemSpec(
        name="poisson_3d",
        equation="u_xx + u_yy + u_zz + 3*pi**2*sin(pi*x)*sin(pi*y)*sin(pi*z)",
        coords=("x", "y", "z"), lb=(0.0, 0.0, 0.0), ub=(1.0, 1.0, 1.0),
        bc_groups=groups, exact=exact,
        hard_bc=("0", "x*(1-x)*y*(1-y)*z*(1-z)") if hard else None,
    )


def test_train_poisson_3d(tmp_path):
    spec = TrainSpec(
        n_col=512, n_band=128, n_adaptive=128, n_bd=16,
        stages=(StageSpec(depth=3, width=32, scl=1.0, epsil=1.0,
                          adam_epochs=500, lbfgs_epochs=600),),
        grid=21, lw=(1.0, 0.0), testing_size=(21, 21, 21), tail_max=0,
        density_every=200, log_every=250,
    )
    r = run_training(_poisson_3d(), spec, output_dir=str(tmp_path))
    assert r.rel_l2 < 5e-3
    # checkpoints + loss history land; 2-D figure artifacts are skipped
    assert (tmp_path / "params_stage_1.npz").exists()
    assert (tmp_path / "loss_1.npz").exists()
    assert not (tmp_path / "solution_residual_1.npz").exists()


def test_train_poisson_3d_soft_bc():
    # soft Dirichlet on all six faces: exercises the BC-group path in 3-D.
    # Soft boundaries converge slowly in 3-D at suite budgets (the 6-face
    # penalty is data-starved) — the hard-BC ansatz is the recommended 3-D
    # route (test above, 6× more accurate in the same wall time); this
    # asserts the path trains, not production accuracy.
    spec = TrainSpec(
        n_col=512, n_band=128, n_adaptive=128, n_bd=48,
        stages=(StageSpec(depth=3, width=32, scl=1.0, epsil=1.0,
                          adam_epochs=800, lbfgs_epochs=1200),),
        grid=15, lw=(1.0, 0.0), testing_size=(17, 17, 17), tail_max=0,
        density_every=400, log_every=400,
    )
    r = run_training(_poisson_3d(hard=False), spec)
    assert r.rel_l2 < 8e-2


# ---------------------------------------------------------------------------
# Non-box domains: the masked L-shape
# ---------------------------------------------------------------------------


def test_lshape_preset_consistency():
    """The L-shape preset's exact field is harmonic on the L (residual ~ 0
    where the mask is 1), every BC group's trace matches it, the two inner
    edges carry u = 0, and the mask excludes exactly the dead quadrant."""
    from tpinn import problems
    from tpinn.core import pde as pde_mod

    prob = problems.lshape_laplace()
    compiled = pde_mod.compile_pde(prob.equation, prob.coords)
    rng = np.random.RandomState(11)
    z = jnp.asarray(rng.uniform(-1, 1, (512, 2)), jnp.float32)
    m = np.asarray(prob.eval_mask(z))[:, 0]
    np.testing.assert_array_equal(
        m, ((np.asarray(z)[:, 0] <= 0) | (np.asarray(z)[:, 1] >= 0))
        .astype(np.float32))
    # harmonic away from the corner (f32 second derivatives of r^{2/3}
    # noise up near r=0: exclude a small disc)
    r = np.linalg.norm(np.asarray(z), axis=1)
    keep = (m > 0) & (r > 0.2)
    f = np.asarray(compiled.residual(prob.exact, z))[:, 0]
    assert np.abs(f[keep]).max() < 5e-2
    for g in prob.bc_groups:
        zc = jnp.asarray(np.linspace(g.lo, g.hi, 17), jnp.float32)
        np.testing.assert_allclose(np.asarray(g.value_fn(zc))[:, 0],
                                   np.asarray(prob.exact(zc))[:, 0],
                                   atol=1e-5)
    # inner edges are homogeneous
    inner_y0 = jnp.asarray(np.stack([np.linspace(0.05, 1, 9),
                                     np.zeros(9)], axis=1), jnp.float32)
    assert float(jnp.abs(prob.exact(inner_y0)).max()) < 1e-6
    inner_x0 = jnp.asarray(np.stack([np.zeros(9),
                                     np.linspace(-1, -0.05, 9)], axis=1),
                           jnp.float32)
    assert float(jnp.abs(prob.exact(inner_x0)).max()) < 1e-5


@pytest.mark.slow
def test_lshape_trains(tmp_path):
    """Masked-box posing end-to-end: the corner-singularity benchmark
    reaches the 1e-2 class at a ~90 s CPU budget, with the metric and the
    adaptive density restricted to the true domain."""
    from tpinn import problems
    from tpinn.core import train

    prob = problems.lshape_laplace()
    spec = train.TrainSpec(
        n_col=768, n_band=128, n_adaptive=384, n_bd=48,
        testing_size=(61, 61), lw=(1.0, 0.0), grid=48, pad_features=3,
        stages=(train.StageSpec(depth=4, width=40, scl=1.0, epsil=1.0,
                                adam_epochs=1500, lbfgs_epochs=1500),),
        log_every=1000,
    )
    lines = []
    res = train.run_training(prob, spec, log_fn=lines.append)
    assert any("masked" in ln for ln in lines)
    assert res.rel_l2 is not None and res.rel_l2 < 5e-2


# ---------------------------------------------------------------------------
# Parametric surrogates: the PDE parameter as an extra coordinate
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_parametric_surrogate_family():
    """One training run solves a whole PDE FAMILY: the load amplitude mu
    rides as an extra input coordinate (no derivatives of it appear, so it
    acts as a variable coefficient), and the trained net is a surrogate
    u(x, mu) queryable at ANY mu in the range with zero extra solves.

    -u'' = mu pi^2 sin(pi x),  u(0)=u(1)=0,  mu in [0.5, 2]
    exact: u = mu sin(pi x) — linear in mu, so mid-range generalization
    is a real check of the parameter axis, not interpolation trivia."""
    from tpinn.core import train

    prob = ProblemSpec(
        name="parametric_poisson",
        equation="u_xx + mu*pi**2*sin(pi*x)",
        coords=("x", "mu"),
        lb=(0.0, 0.5), ub=(1.0, 2.0),
        bc_groups=(
            # u(0, mu) = u(1, mu) = 0 across the whole parameter range
            sample.BCGroup(lo=(0.0, 0.5), hi=(0.0, 2.0), value=0.0),
            sample.BCGroup(lo=(1.0, 0.5), hi=(1.0, 2.0), value=0.0),
        ),
        exact=lambda z: z[:, 1:2] * jnp.sin(jnp.pi * z[:, 0:1]),
    )
    spec = TrainSpec(
        n_col=768, n_band=128, n_adaptive=256, n_bd=48,
        testing_size=(48, 32), lw=(1.0, 0.0), grid=48, pad_features=3,
        stages=(StageSpec(depth=3, width=32, scl=1.0, epsil=1.0,
                          adam_epochs=1500, lbfgs_epochs=1500),),
        log_every=1000,
    )
    res = train.run_training(prob, spec)
    assert res.rel_l2 is not None and res.rel_l2 < 5e-3
    # query the surrogate at parameter values never specially sampled
    x = np.linspace(0, 1, 101)
    for mu in (0.63, 1.0, 1.77):
        z = jnp.asarray(np.stack([x, np.full_like(x, mu)], axis=1),
                        jnp.float32)
        u = np.asarray(res.predict(z))[:, 0]
        err = (np.linalg.norm(u - mu * np.sin(np.pi * x))
               / np.linalg.norm(mu * np.sin(np.pi * x)))
        assert err < 1e-2, (mu, err)
