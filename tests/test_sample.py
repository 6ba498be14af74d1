"""On-device sampling: LHS stratification, inverse-CDF distribution,
Gaussian smoothing parity vs scipy, sampler pipeline shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal
import scipy.stats

from tpinn.core import sample


def test_lhs_stratification():
    key = jax.random.PRNGKey(0)
    n = 50
    pts = sample.lhs(key, n, 2)
    assert pts.shape == (n, 2)
    assert float(pts.min()) >= 0.0 and float(pts.max()) <= 1.0
    # exactly one point per 1/n slab per axis — the LHS property
    for d in range(2):
        bins = np.floor(np.asarray(pts[:, d]) * n).astype(int)
        assert sorted(bins.tolist()) == list(range(n))


def test_lhs_box():
    pts = sample.lhs_box(jax.random.PRNGKey(1), 40, jnp.array([0.1, 0.0]),
                         jnp.array([1.0, 2.0]))
    assert float(pts[:, 0].min()) >= 0.1
    assert float(pts[:, 0].max()) <= 1.0
    assert float(pts[:, 1].max()) <= 2.0


def test_inverse_cdf_2d_follows_density():
    g = 41
    x = jnp.linspace(0.0, 1.0, g)
    X, Y = jnp.meshgrid(x, x)
    # all mass in the left half
    F = jnp.where(X < 0.5, 1.0, 0.0)
    pts = sample.inverse_cdf_2d(jax.random.PRNGKey(2), X, Y, F, 500)
    assert pts.shape == (500, 2)
    frac_left = float(jnp.mean(pts[:, 0] < 0.5 + 1.5 / g))
    assert frac_left > 0.97


def test_inverse_cdf_1d_follows_density():
    g = 101
    x = jnp.linspace(0.0, 1.0, g)[:, None]
    f = jnp.where(x > 0.7, 1.0, 0.0)
    pts = sample.inverse_cdf_1d(jax.random.PRNGKey(3), x, f, 400)
    assert float(jnp.mean(pts[:, 0] > 0.7 - 0.02)) > 0.97


def test_gaussian_smooth_2d_matches_scipy():
    """Separable on-device smoothing ≡ reference's scipy convolve2d with the
    outer-product window (software.py:71-83)."""
    rng = np.random.default_rng(0)
    F = rng.random((32, 28)).astype(np.float32)
    sig, wid = [1.0, 1.0], [5, 5]
    xg = np.linspace(-sig[0], sig[0], wid[0])
    yg = np.linspace(-sig[1], sig[1], wid[1])
    window = scipy.stats.norm.pdf(xg) * scipy.stats.norm.pdf(yg)[:, None]
    win_n = window / window.sum()
    expected = scipy.signal.convolve2d(F, win_n, mode="same")
    got = sample.gaussian_smooth_2d(jnp.asarray(F), sig, wid)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-6)


def test_gaussian_smooth_1d_matches_scipy():
    rng = np.random.default_rng(1)
    f = rng.random((64, 1)).astype(np.float32)
    xg = np.linspace(-1.0, 1.0, 5)
    w = scipy.stats.norm.pdf(xg)
    w = w / w.sum()
    expected = scipy.signal.convolve(f[:, 0], w, mode="same")[:, None]
    got = sample.gaussian_smooth_1d(jnp.asarray(f), 1.0, 5)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-6)


def test_boundary_band_density():
    x = jnp.linspace(0.0, 1.0, 21)
    X, Y = jnp.meshgrid(x, x)
    F = sample.boundary_band_density(X, Y, jnp.array([0.0, 0.0]), jnp.array([1.0, 1.0]))
    assert float(F[0, 0]) == 1.0          # corner in the band
    assert float(F[10, 10]) == 0.0        # center not
    assert float(F[0, 10]) == 1.0         # edge midpoint in band


def _mk_sampler():
    cfg = sample.SamplerConfig(n_col=100, n_band=40, n_adaptive=30, n_bd=20, grid=31)
    groups = [
        sample.BCGroup(lo=(0.1, 0.0), hi=(0.1, 1.0), value=1.0),
        sample.BCGroup(lo=(1.0, 0.0), hi=(1.0, 1.0), value=0.0),
    ]
    return sample.make_sampler(cfg, groups, lb=[0.1, 0.0], ub=[1.0, 1.0])


@pytest.mark.slow
def test_make_sampler_shapes_and_concat():
    fn, (R, T) = _mk_sampler()
    F = jnp.ones_like(R)
    data = jax.jit(fn)(jax.random.PRNGKey(4), F)
    # BC points are concatenated into the collocation set (software.py:569)
    assert data["x_col"].shape == (100 + 40 + 30 + 2 * 20, 2)
    assert len(data["x_bd"]) == 2
    assert data["x_bd"][0].shape == (20, 2)
    assert data["u_bd"][0].shape == (20, 1)
    np.testing.assert_allclose(np.asarray(data["u_bd"][0]), 1.0)
    np.testing.assert_allclose(np.asarray(data["x_bd"][0][:, 0]), 0.1, atol=1e-6)
    # in-domain
    assert float(data["x_col"][:, 0].min()) >= 0.1 - 1e-5


def test_make_sampler_1d():
    cfg = sample.SamplerConfig(n_col=64, n_band=0, n_adaptive=32, n_bd=8, grid=101)
    groups = [
        sample.BCGroup(lo=(0.0,), hi=(0.0,), value=0.0),
        sample.BCGroup(lo=(1.0,), hi=(1.0,), value=0.0),
    ]
    fn, (x_nodes,) = sample.make_sampler_1d(cfg, groups, lb=[0.0], ub=[1.0])
    F = jnp.ones_like(x_nodes)
    data = jax.jit(fn)(jax.random.PRNGKey(5), F)
    assert data["x_col"].shape == (64 + 32 + 16, 1)
    assert data["x_bd"][0].shape == (8, 1)
    np.testing.assert_allclose(np.asarray(data["x_bd"][1]), 1.0)


def test_bc_value_fn():
    from tpinn.core import pde
    g = pde.compile_coord_expr("sin(pi*t)", coords=("r", "t"))
    grp = sample.BCGroup(lo=(0.1, 0.0), hi=(0.1, 1.0), value_fn=g)
    pts = jnp.array([[0.1, 0.5], [0.1, 0.25]])
    np.testing.assert_allclose(
        np.asarray(grp.target(pts))[:, 0],
        [np.sin(np.pi * 0.5), np.sin(np.pi * 0.25)],
        rtol=1e-5,
    )


def test_adaptive_density_concentrates_points():
    """predictF-equivalent density + inverse-CDF sampling concentrates
    collocation points where the residual is large (the adaptive
    collocation feature, software.py:608-623 + :566)."""
    from tpinn.core import train as train_mod
    from tpinn.core import pde

    compiled = pde.compile_pde("u_xx + u_yy", coords=("x", "y"))

    # predictor whose residual is a bump at (0.75, 0.75):
    # u = exp(-((x-.75)^2+(y-.75)^2)/0.01) has large Laplacian near center
    def predictor(params, z):
        x, y = z[:, 0:1], z[:, 1:2]
        return jnp.exp(-((x - 0.75) ** 2 + (y - 0.75) ** 2) / 0.01)

    g = 61
    xs = jnp.linspace(0.0, 1.0, g)
    R, T = jnp.meshgrid(xs, xs)
    density_fn = train_mod.make_density_fn(predictor, compiled, (R, T))
    F = density_fn({})
    assert F.shape == (g, g)
    # density peaks near the bump
    peak = jnp.unravel_index(jnp.argmax(F), F.shape)
    assert abs(float(T[peak]) - 0.75) < 0.1
    assert abs(float(R[peak]) - 0.75) < 0.1

    pts = sample.inverse_cdf_2d(jax.random.PRNGKey(0), R, T, F, 2000)
    near = jnp.mean(
        (jnp.abs(pts[:, 0] - 0.75) < 0.15) & (jnp.abs(pts[:, 1] - 0.75) < 0.15)
    )
    # bump region is 9% of the area but draws far more of the samples
    assert float(near) > 0.3
