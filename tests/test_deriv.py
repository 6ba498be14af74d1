"""Derivative engine vs analytic derivatives of closed-form functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.core import deriv


def f_poly(z):
    # u = x^3 * y^2 + sin(x) ; two outputs to exercise m > 1
    x, y = z[:, 0:1], z[:, 1:2]
    u1 = x**3 * y**2 + jnp.sin(x)
    u2 = jnp.exp(0.5 * y) * x
    return jnp.concatenate([u1, u2], axis=1)


@pytest.fixture
def z():
    key = jax.random.PRNGKey(0)
    return jax.random.uniform(key, (64, 2), minval=0.2, maxval=1.5)


def test_partials_second_order(z):
    x, y = z[:, 0:1], z[:, 1:2]
    parts = deriv.partials(f_poly, z, [(), (0,), (1,), (0, 0), (1, 1), (0, 1)])

    np.testing.assert_allclose(parts[()][:, 0:1], x**3 * y**2 + jnp.sin(x), rtol=1e-5)
    np.testing.assert_allclose(
        parts[(0,)][:, 0:1], 3 * x**2 * y**2 + jnp.cos(x), rtol=1e-5
    )
    np.testing.assert_allclose(parts[(1,)][:, 0:1], 2 * x**3 * y, rtol=1e-5)
    np.testing.assert_allclose(
        parts[(0, 0)][:, 0:1], 6 * x * y**2 - jnp.sin(x), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(parts[(1, 1)][:, 0:1], 2 * x**3, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(parts[(0, 1)][:, 0:1], 6 * x**2 * y, rtol=1e-4, atol=1e-5)
    # second output
    np.testing.assert_allclose(
        parts[(0, 1)][:, 1:2], 0.5 * jnp.exp(0.5 * y), rtol=1e-4, atol=1e-5
    )


def test_third_order(z):
    parts = deriv.partials(f_poly, z, [(0, 0, 0)])
    y = z[:, 1:2]
    x = z[:, 0:1]
    np.testing.assert_allclose(
        parts[(0, 0, 0)][:, 0:1], 6 * y**2 - jnp.cos(x), rtol=1e-4, atol=1e-4
    )


def test_plan_minimal_passes():
    pairs, singles, highers, want_value = deriv.plan_passes(
        [(), (0,), (1,), (0, 0), (1, 1)]
    )
    assert pairs == [(0, 0), (1, 1)]
    assert singles == []  # firsts covered by the pair passes
    assert highers == []
    assert want_value


def test_reverse_engine_matches_forward(z):
    """Reference-style vjp engine agrees with the forward engine."""
    grad_all, sol = deriv.vect_grad_reverse(f_poly, z)
    parts = deriv.partials(f_poly, z, [(0,), (1,)])
    np.testing.assert_allclose(sol, f_poly(z), rtol=1e-6)
    # reference layout: column o*d + i = d(out_o)/d(z_i)
    np.testing.assert_allclose(grad_all[:, 0:1], parts[(0,)][:, 0:1], rtol=1e-5)
    np.testing.assert_allclose(grad_all[:, 1:2], parts[(1,)][:, 0:1], rtol=1e-5)
    np.testing.assert_allclose(grad_all[:, 2:3], parts[(0,)][:, 1:2], rtol=1e-5)
    np.testing.assert_allclose(grad_all[:, 3:4], parts[(1,)][:, 1:2], rtol=1e-5)


def test_partials_jittable(z):
    fn = jax.jit(lambda zz: deriv.partials(f_poly, zz, [(0, 0), (1, 1)])[(0, 0)])
    out = fn(z)
    assert out.shape == (64, 2)
