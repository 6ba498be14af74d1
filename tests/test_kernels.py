"""Pallas kernel vs the pure-JAX fused engine (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.core import net, pde
from tpinn.kernels import mlp_taylor

IDX = [(), (0,), (1,), (0, 0), (1, 1)]


def _setup(act="tanh", kinds=("minmax", "periodic"), depth=3, width=24):
    fm = net.feature_map_for(kinds)
    spec = net.MLPSpec(depth=depth, width=width, act_first=act, scl=1.5,
                       epsil=0.8)
    params = net.init_params(jax.random.PRNGKey(0), spec, fm)
    lb = jnp.array([0.1, 0.0])
    ub = jnp.array([1.0, 1.0])
    predictor = net.make_predictor(spec, fm, lb, ub)
    z = jax.random.uniform(jax.random.PRNGKey(1), (300, 2), minval=0.2,
                           maxval=0.9)
    return predictor, params, z, spec, fm, lb, ub


@pytest.mark.parametrize("act,kinds", [
    ("tanh", ("minmax", "periodic")),
    ("sin", ("minmax", "minmax")),
])
def test_kernel_matches_fused_engine(act, kinds):
    predictor, params, z, spec, fm, lb, ub = _setup(act=act, kinds=kinds)
    got = mlp_taylor.taylor2_mlp_pallas(
        params, z, spec, fm, lb, ub, IDX, block=128, interpret=True
    )
    want = predictor.tpinn_partials(params, z, IDX)
    for ix in IDX:
        np.testing.assert_allclose(
            np.asarray(got[ix]), np.asarray(want[ix]),
            rtol=3e-4, atol=1e-5, err_msg=str(ix),
        )


def test_kernel_padding_partial_block():
    """N not a multiple of the block size pads and trims correctly."""
    predictor, params, z, spec, fm, lb, ub = _setup()
    z = z[:77]
    got = mlp_taylor.taylor2_mlp_pallas(
        params, z, spec, fm, lb, ub, [(0, 0)], block=64, interpret=True
    )
    want = predictor.tpinn_partials(params, z, [(0, 0)])
    np.testing.assert_allclose(np.asarray(got[(0, 0)]),
                               np.asarray(want[(0, 0)]), rtol=3e-4, atol=1e-5)


def test_residual_kernel_fn():
    predictor, params, z, spec, fm, lb, ub = _setup()
    compiled = pde.compile_pde("u_rr + 1/r*u_r + 1/r**2*u_tt",
                               coords=("r", "t"))
    fn = mlp_taylor.residual_kernel_fn(predictor, compiled, interpret=True)
    f_kernel = fn(params, z)
    f_ref = compiled.residual_fast(predictor, params, z)
    np.testing.assert_allclose(np.asarray(f_kernel), np.asarray(f_ref),
                               rtol=1e-3, atol=1e-4)


def test_adam_kernel_matches_optax():
    import optax
    from tpinn.kernels import adam as adam_k

    n = 1000
    key = jax.random.PRNGKey(0)
    params = jax.random.normal(key, (n,))
    grads = jax.random.normal(jax.random.PRNGKey(1), (n,))
    opt = optax.adam(1e-3)
    state = opt.init(params)

    p, m, v = params, jnp.zeros(n), jnp.zeros(n)
    p_ox = params
    for step in range(1, 4):
        g = grads * step
        updates, state = opt.update(g, state)
        p_ox = optax.apply_updates(p_ox, updates)
        p, m, v = adam_k.adam_update_flat(g, p, m, v, 1e-3, step,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ox),
                               rtol=1e-5, atol=1e-7)


def test_adam_kernel_partial_block():
    from tpinn.kernels import adam as adam_k

    n = 777
    g = jnp.ones(n) * 0.1
    p, m, v = jnp.zeros(n), jnp.zeros(n), jnp.zeros(n)
    p2, m2, v2 = adam_k.adam_update_flat(g, p, m, v, 0.01, 1, block=256,
                                         interpret=True)
    assert p2.shape == (n,)
    # every coordinate identical update
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p2)[0], rtol=1e-6)
    assert float(p2[0]) < 0
