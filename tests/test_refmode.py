"""Reference-semantics mode: parity between the reverse-over-reverse
residual (the reference's algorithm) and the forward-mode compiled path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.core import net, pde, refmode


def _predictor():
    fm = net.feature_map_for(("minmax", "periodic"))
    spec = net.MLPSpec(depth=3, width=20)
    params = net.init_params(jax.random.PRNGKey(0), spec, fm)
    lb, ub = jnp.array([0.1, 0.0]), jnp.array([1.0, 1.0])
    return net.make_predictor(spec, fm, lb, ub), params


@pytest.mark.slow
def test_reference_residual_matches_compiled():
    predictor, params = _predictor()
    z = jax.random.uniform(jax.random.PRNGKey(1), (80, 2), minval=0.2,
                           maxval=0.95)
    f_ref = refmode.reference_residual_polar(lambda zz: predictor(params, zz), z)
    compiled = pde.compile_pde("u_rr + 1/r*u_r + 1/r**2*u_tt",
                               coords=("r", "t"))
    f_fwd = compiled.residual_fast(predictor, params, z)
    np.testing.assert_allclose(np.asarray(f_ref), np.asarray(f_fwd),
                               rtol=2e-3, atol=1e-5)


def test_reference_adam_step_decreases_loss():
    predictor, params = _predictor()
    key = jax.random.PRNGKey(2)
    data = {
        "x_col": jax.random.uniform(key, (400, 2), minval=0.15, maxval=0.95),
        "x_bd": [
            jnp.stack([jnp.full(50, 0.1), jnp.linspace(0, 1, 50)], axis=1),
            jnp.stack([jnp.full(50, 1.0), jnp.linspace(0, 1, 50)], axis=1),
        ],
        "u_bd": [jnp.ones((50, 1)), jnp.zeros((50, 1))],
    }
    loss_fn = refmode.make_reference_loss(predictor)
    opt, step = refmode.make_reference_adam_step(loss_fn, lr=1e-3)
    opt_state = opt.init(params)
    lw = jnp.array([0.05, 0.0])
    ref = jnp.array(1.0)
    _, _, info0 = step(params, opt_state, data, lw, ref)
    p, s = params, opt_state
    for _ in range(50):
        p, s, info = step(p, s, data, lw, ref)
    assert float(info[0]) < float(info0[0])
