"""Preset oracle validation — focused on the quadrature-based
burgers_shock oracle (tpinn/problems/__init__.py::_burgers_shock_exact),
whose correctness is numerical, not by construction."""

import numpy as np

from tpinn import problems


def _u(p, x, t):
    return float(np.asarray(p.exact(np.array([[x, t]]))).ravel()[0])


def test_burgers_shock_oracle():
    p = problems.burgers_shock()
    nu = 0.01 / np.pi

    # IC and Dirichlet edges are exact (antisymmetry of the integrand)
    z0 = np.stack([np.linspace(-1, 1, 21), np.zeros(21)], 1)
    assert np.abs(np.asarray(p.exact(z0)).ravel()
                  + np.sin(np.pi * z0[:, 0])).max() < 1e-12
    zb = np.array([[1.0, 0.3], [-1.0, 0.9], [1.0, 1.0]])
    assert np.abs(np.asarray(p.exact(zb))).max() < 1e-12

    # the oracle satisfies the PDE (central differences, smooth point
    # and a near-front point)
    for x, t, tol in ((0.5, 0.4, 1e-5), (0.08, 0.8, 1e-4)):
        h = 1e-5
        ut = (_u(p, x, t + h) - _u(p, x, t - h)) / (2 * h)
        ux = (_u(p, x + h, t) - _u(p, x - h, t)) / (2 * h)
        uxx = (_u(p, x + h, t) - 2 * _u(p, x, t) + _u(p, x - h, t)) / h**2
        assert abs(ut + _u(p, x, t) * ux - nu * uxx) < tol

    # a genuine front: |u_x(0, 1)| is O(100), unlike burgers_1d's
    # smooth manufactured solution (|u_x| <= pi)
    slope = (_u(p, 1e-4, 1.0) - _u(p, -1e-4, 1.0)) / 2e-4
    assert slope < -50

    # registered with a hard-BC ansatz consistent with IC/edges
    assert "burgers_shock" in problems.PRESETS
    lift, bubble = problems.HARD_BC["burgers_shock"]
    assert lift == "-sin(pi*x)" and "1 - x**2" in bubble
