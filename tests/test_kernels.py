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


@pytest.mark.parametrize("act,kinds", [
    ("tanh", ("minmax", "periodic")),
    ("sin", ("minmax", "minmax")),
])
def test_kernel_vjp_grads_match_autodiff(act, kinds):
    """The closed-form Pallas backward == jax.grad through the pure-JAX
    engine, for a residual-MSE loss (the training path contract)."""
    from tpinn.kernels.taylor_vjp import make_kernel_partials

    predictor, params, z, spec, fm, lb, ub = _setup(act=act, kinds=kinds)
    compiled = pde.compile_pde("u_rr + 1/r*u_r + 1/r**2*u_tt",
                               coords=("r", "t"))
    kp = make_kernel_partials(spec, fm, lb, ub, compiled.indices,
                              block=128, interpret=True)

    def loss_kernel(p):
        f = compiled.evaluate(z, kp(p, z, compiled.indices))
        return jnp.mean(f ** 2)

    def loss_ref(p):
        f = compiled.residual_fast(predictor, p, z)
        return jnp.mean(f ** 2)

    np.testing.assert_allclose(float(loss_kernel(params)),
                               float(loss_ref(params)), rtol=1e-4)
    g_kernel = jax.grad(loss_kernel)(params)
    g_ref = jax.grad(loss_ref)(params)
    for gk, gr in zip(g_kernel["layers"], g_ref["layers"]):
        np.testing.assert_allclose(np.asarray(gk["w"]), np.asarray(gr["w"]),
                                   rtol=2e-3, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gk["b"]), np.asarray(gr["b"]),
                                   rtol=2e-3, atol=2e-5)


def test_kernel_vjp_partial_block_padding():
    """Padded rows carry zero cotangent: gradients with N % block != 0 match
    the unpadded autodiff exactly."""
    from tpinn.kernels.taylor_vjp import make_kernel_partials

    predictor, params, z, spec, fm, lb, ub = _setup()
    z = z[:77]
    compiled = pde.compile_pde("u_rr + u_tt", coords=("r", "t"))
    kp = make_kernel_partials(spec, fm, lb, ub, compiled.indices,
                              block=64, interpret=True)
    loss_k = lambda p: jnp.mean(
        compiled.evaluate(z, kp(p, z, compiled.indices)) ** 2
    )
    loss_r = lambda p: jnp.mean(
        compiled.residual_fast(predictor, p, z) ** 2
    )
    g_k = jax.grad(loss_k)(params)
    g_r = jax.grad(loss_r)(params)
    for gk, gr in zip(g_k["layers"], g_r["layers"]):
        np.testing.assert_allclose(np.asarray(gk["w"]), np.asarray(gr["w"]),
                                   rtol=2e-3, atol=2e-5)


def test_loss_kernel_engine_matches_auto():
    """make_loss(engine='kernel') reproduces the default engine's loss and
    parameter gradients on a full loss (BC terms + residual)."""
    from tpinn.core import loss as loss_mod

    predictor, params, z, spec, fm, lb, ub = _setup()
    compiled = pde.compile_pde("u_rr + 1/r*u_r + 1/r**2*u_tt",
                               coords=("r", "t"))
    data = {
        "x_col": z,
        "x_bd": [jnp.stack([jnp.full((40,), 0.1),
                            jnp.linspace(0.0, 1.0, 40)], axis=1)],
        "u_bd": [jnp.ones((40, 1))],
    }
    lw = jnp.array([0.05, 0.0])
    ref = jnp.array(1.0)
    # interpret-mode kernels: patch the default block via partial interpret
    import tpinn.kernels.taylor_vjp as tv
    loss_auto = loss_mod.make_loss(predictor, compiled)
    orig = tv.make_kernel_partials
    tv_interp = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    tv.make_kernel_partials = tv_interp
    try:
        loss_kernel = loss_mod.make_loss(predictor, compiled, engine="kernel")
    finally:
        tv.make_kernel_partials = orig

    (l_a, info_a) = loss_auto(params, data, lw, ref)
    (l_k, info_k) = loss_kernel(params, data, lw, ref)
    np.testing.assert_allclose(float(l_k), float(l_a), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(info_k), np.asarray(info_a),
                               rtol=1e-4, atol=1e-7)
    g_a = jax.grad(lambda p: loss_auto(p, data, lw, ref)[0])(params)
    g_k = jax.grad(lambda p: loss_kernel(p, data, lw, ref)[0])(params)
    for gk, gr in zip(g_k["layers"], g_a["layers"]):
        np.testing.assert_allclose(np.asarray(gk["w"]), np.asarray(gr["w"]),
                                   rtol=2e-3, atol=2e-5)


def test_kernel_engine_rejects_deriv_loss_and_composed():
    from tpinn.core import loss as loss_mod

    predictor, params, z, spec, fm, lb, ub = _setup()
    compiled = pde.compile_pde("u_rr + u_tt", coords=("r", "t"))
    with pytest.raises(ValueError, match="deriv_loss"):
        loss_mod.make_loss(predictor, compiled, deriv_loss=True,
                           engine="kernel")
    composed = net.compose_stages(predictor, spec, fm, lb, ub)
    with pytest.raises(ValueError, match="plain dense"):
        loss_mod.make_loss(composed, compiled, engine="kernel")


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


@pytest.mark.tpu
def test_kernel_compiled_on_tpu():
    """Non-interpret kernel parity + engine benchmark on real TPU hardware
    (subprocess: the test suite itself pins JAX to CPU).  Run with
    ``pytest -m tpu`` on a TPU-attached host."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    script = Path(__file__).resolve().parent.parent / "scripts" / \
        "kernel_tpu_check.py"
    proc = subprocess.run(
        [sys.executable, str(script), "--batch", "1024", "--steps", "50"],
        capture_output=True, text=True, timeout=1200,
        env={k: v for k, v in __import__("os").environ.items()
             if k not in ("JAX_PLATFORMS", "XLA_FLAGS")},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert "TPU" in report["device"], report["device"]
    assert report["fwd_max_abs_err"] < 1e-4
    if "bwd_compile_error" in report:
        # tunneled runtimes reject the backward kernel's Mosaic module
        # (forward compiles + runs); parity for the backward math is
        # covered in interpret mode above
        pytest.skip("backward kernel rejected by this runtime: "
                    + report["bwd_compile_error"])
    assert report["bwd_max_rel_err"] < 2e-3


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


def test_kernel_hard_bc_product_rule_grads():
    """engine='kernel' under a hard-BC wrapper: the Pallas kernel runs on
    the raw net and net.hard_bc_partials recombines u = lift + bubble·N by
    the product rule (tpinn/core/loss.py kernel branch) — loss value and
    parameter gradients must match autodiff through the wrapped
    predictor."""
    from tpinn.core.net import hard_bc_partials, wrap_hard_bc
    from tpinn.kernels.taylor_vjp import make_kernel_partials

    predictor, params, z, spec, fm, lb, ub = _setup()
    lift = lambda zz: 1.0 - (zz[:, 0:1] - 0.1) / 0.9
    bubble = lambda zz: (zz[:, 0:1] - 0.1) * (1.0 - zz[:, 0:1])
    hard = wrap_hard_bc(predictor, lift, bubble)
    compiled = pde.compile_pde("u_rr + 1/r*u_r + 1/r**2*u_tt",
                               coords=("r", "t"))

    need = set(compiled.indices) | {()}
    for ix in compiled.indices:
        for i in ix:
            need.add((i,))
    raw_kernel = make_kernel_partials(
        spec, fm, lb, ub, tuple(sorted(need, key=lambda t: (len(t), t))),
        block=128, interpret=True,
    )
    kp = hard_bc_partials(raw_kernel, lift, bubble)

    def loss_kernel(p):
        f = compiled.evaluate(z, kp(p, z, compiled.indices))
        return jnp.mean(f ** 2)

    def loss_ref(p):
        f = compiled.residual(lambda zz: hard(p, zz), z)
        return jnp.mean(f ** 2)

    np.testing.assert_allclose(float(loss_kernel(params)),
                               float(loss_ref(params)), rtol=1e-4)
    g_kernel = jax.grad(loss_kernel)(params)
    g_ref = jax.grad(loss_ref)(params)
    for gk, gr in zip(g_kernel["layers"], g_ref["layers"]):
        np.testing.assert_allclose(np.asarray(gk["w"]), np.asarray(gr["w"]),
                                   rtol=2e-3, atol=3e-5)
        np.testing.assert_allclose(np.asarray(gk["b"]), np.asarray(gr["b"]),
                                   rtol=2e-3, atol=3e-5)
