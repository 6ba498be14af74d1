"""Optimizers: L-BFGS vs scipy on standard problems; Adam phase automaton."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from tpinn.core import optim


def _info(f):
    """Wrap a scalar objective into the (f, g, info) contract."""
    def vg(x):
        val, g = jax.value_and_grad(f)(x)
        return val, g, jnp.stack([val, val, val])
    return vg


def test_lbfgs_quadratic_exact():
    A = jnp.array([[3.0, 0.5], [0.5, 1.0]])
    b = jnp.array([1.0, -2.0])
    f = lambda x: 0.5 * x @ A @ x - b @ x
    cfg = optim.LBFGSConfig(max_iters=50, tolerance=1e-5)
    res = optim.lbfgs_minimize(_info(f), jnp.zeros(2), cfg)
    x_star = jnp.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_star), atol=1e-4)
    assert bool(res.converged)


def test_lbfgs_rosenbrock_matches_scipy():
    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    x0 = jnp.array([-1.2, 1.0, -0.5, 0.8], dtype=jnp.float32)
    cfg = optim.LBFGSConfig(max_iters=300, tolerance=1e-4)
    res = optim.lbfgs_minimize(_info(rosen), x0, cfg)
    ref = scipy.optimize.minimize(
        lambda x: float(rosen(jnp.asarray(x, jnp.float32))),
        np.asarray(x0), method="L-BFGS-B",
        jac=lambda x: np.asarray(jax.grad(rosen)(jnp.asarray(x, jnp.float32)),
                                 dtype=np.float64),
    )
    # both should find the global minimum at ones
    np.testing.assert_allclose(np.asarray(res.x), np.ones(4), atol=2e-2)
    assert float(res.f) <= ref.fun + 1e-3


def test_lbfgs_history_records_iterates():
    f = lambda x: jnp.sum((x - 2.0) ** 2)
    cfg = optim.LBFGSConfig(max_iters=30, tolerance=1e-6)
    res = optim.lbfgs_minimize(_info(f), jnp.zeros(3), cfg)
    n = int(res.n_iters)
    hist = np.asarray(res.history)
    assert hist[0, 0] == pytest.approx(12.0)  # f at x0
    # monotone-ish decrease over accepted iterates
    assert hist[n, 0] < 1e-6


def test_lbfgs_history_evals_cadence():
    """history="evals" records one row per FUNCTION EVALUATION (the
    reference's jax.debug.callback cadence, software.py:485-488): at least
    as many rows as accepted iterates, same converged optimum, and the
    rows include line-search probe values."""
    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1 - x[:-1]) ** 2)

    x0 = jnp.array([-1.2, 1.0], dtype=jnp.float32)
    res_i = optim.lbfgs_minimize(
        _info(rosen), x0, optim.LBFGSConfig(max_iters=100, tolerance=1e-4))
    res_e = optim.lbfgs_minimize(
        _info(rosen), x0,
        optim.LBFGSConfig(max_iters=100, tolerance=1e-4, history="evals"))
    # identical optimization trajectory — only the recording differs
    np.testing.assert_allclose(np.asarray(res_e.x), np.asarray(res_i.x),
                               rtol=1e-6)
    assert int(res_e.n_iters) == int(res_i.n_iters)
    rows_i, rows_e = int(res_i.n_rows), int(res_e.n_rows)
    assert rows_e >= rows_i  # every accepted iterate was also an eval
    assert rows_e > int(res_e.n_iters)  # line searches cost extra evals
    hist = np.asarray(res_e.history)
    assert np.all(np.isfinite(hist[:rows_e]))
    assert hist[0, 0] == pytest.approx(float(rosen(x0)), rel=1e-5)


def test_lbfgs_over_pytree():
    params = {"a": jnp.array([1.0, 2.0]), "b": jnp.array(0.5)}

    def loss_fn(p, data, lw, ref):
        loss = jnp.sum((p["a"] - 3.0) ** 2) + (p["b"] + 1.0) ** 2
        return loss / ref, jnp.stack([loss, loss, loss])

    cfg = optim.LBFGSConfig(max_iters=50, tolerance=1e-5)
    out, hist, n = optim.lbfgs_over_pytree(
        loss_fn, params, data=None, lw=jnp.array([1.0]), ref=jnp.array(1.0),
        config=cfg,
    )
    np.testing.assert_allclose(np.asarray(out["a"]), 3.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["b"]), -1.0, atol=1e-4)


def _toy_phase(epochs, density=False, log=None):
    """Adam phase on a 2-parameter quadratic with a dummy sampler."""

    def loss_fn(params, data, lw, ref):
        loss = jnp.sum((params["w"] - data["target"]) ** 2)
        info = jnp.stack([loss, loss, lw[0] * loss])
        return loss / ref, info

    def sample_fn(key, F):
        return {"target": jnp.full((2,), 5.0) + 0.0 * F[0, 0]}

    density_fn = (lambda p: jnp.ones((3, 3)) * jnp.sum(p["w"]) * 0 + 2.0) if density else None
    cfg = optim.AdamConfig(epochs=epochs, lr=0.05, resample_every=10,
                           density_every=20, plateau_every=40, tail_max=50,
                           log_every=10)
    phase = optim.make_adam_phase(loss_fn, sample_fn, density_fn, cfg,
                                  info_width=3, log_fn=log)
    params = {"w": jnp.zeros(2)}
    data = sample_fn(jax.random.PRNGKey(0), jnp.ones((3, 3)))
    return phase(jax.random.PRNGKey(1), params, data, jnp.ones((3, 3)),
                 jnp.array([1.0]), jnp.array(1.0))


def test_adam_phase_converges_and_history():
    res = _toy_phase(200)
    np.testing.assert_allclose(np.asarray(res.params["w"]), 5.0, atol=0.2)
    n = int(res.n_valid)
    assert n >= 200
    hist = np.asarray(res.history)
    assert hist[0, 0] == pytest.approx(50.0, rel=1e-3)  # initial loss 2*25
    assert hist[n - 1, 0] < hist[0, 0]
    # tail rows beyond n_valid stay zero
    assert np.all(hist[n:, :] == 0.0)


def test_adam_phase_density_refresh():
    res = _toy_phase(100, density=True)
    np.testing.assert_allclose(np.asarray(res.density), 2.0)


def test_adam_phase_log_callback():
    rows = []
    res = _toy_phase(100, log=lambda step, info: rows.append((int(step), float(info[0]))))
    jax.block_until_ready(res.params)
    jax.effects_barrier()
    steps = sorted(s for s, _ in rows)
    assert steps == [10, 20, 30, 40, 50, 60, 70, 80, 90]


def test_adam_plateau_halves_lr():
    """A flat loss landscape triggers the plateau detector."""

    def loss_fn(params, data, lw, ref):
        loss = 0.0 * jnp.sum(params["w"]) + 1.0
        info = jnp.stack([loss, loss, loss])
        return loss / ref, info

    sample_fn = lambda key, F: {"d": jnp.zeros(1)}
    cfg = optim.AdamConfig(epochs=80, lr=0.1, resample_every=1000,
                           density_every=20, plateau_every=40, tail_max=0,
                           plateau_ratio=0.4)
    phase = optim.make_adam_phase(loss_fn, sample_fn, None, cfg, info_width=3)
    res = phase(jax.random.PRNGKey(0), {"w": jnp.zeros(2)},
                {"d": jnp.zeros(1)}, jnp.ones((3, 3)),
                jnp.array([1.0]), jnp.array(1.0))
    # two plateau checks at steps 40 and 80 → lr quartered… but std=0 gives
    # mm12/std = nan → condition False per IEEE, matching reference behavior
    # (reference would also get nan<0.4 == False). Use a noisy-but-flat loss
    # instead to assert halving:
    assert float(res.lr) == pytest.approx(0.1)


def test_adam_plateau_halving_with_noise():
    def loss_fn(params, data, lw, ref):
        # pseudo-noise from data; mean identical across windows
        loss = 1.0 + 0.01 * data["noise"] + 0.0 * jnp.sum(params["w"])
        info = jnp.stack([loss, loss, loss])
        return loss / ref, info

    def sample_fn(key, F):
        return {"noise": jax.random.normal(key)}

    cfg = optim.AdamConfig(epochs=80, lr=0.1, resample_every=1,
                           density_every=1000, plateau_every=40, tail_max=0)
    phase = optim.make_adam_phase(loss_fn, sample_fn, None, cfg, info_width=3)
    res = phase(jax.random.PRNGKey(0), {"w": jnp.zeros(2)},
                sample_fn(jax.random.PRNGKey(9), None), jnp.ones((3, 3)),
                jnp.array([1.0]), jnp.array(1.0))
    assert float(res.lr) == pytest.approx(0.025)  # halved twice (steps 40, 80)


def test_adam_plateau_lr_floor():
    """lr_min clamps the plateau halving (0.0 = reference's unbounded)."""
    def loss_fn(params, data, lw, ref):
        loss = 1.0 + 0.01 * data["noise"] + 0.0 * jnp.sum(params["w"])
        info = jnp.stack([loss, loss, loss])
        return loss / ref, info

    def sample_fn(key, F):
        return {"noise": jax.random.normal(key)}

    cfg = optim.AdamConfig(epochs=80, lr=0.1, resample_every=1,
                           density_every=1000, plateau_every=40, tail_max=0,
                           lr_min=0.04)
    phase = optim.make_adam_phase(loss_fn, sample_fn, None, cfg, info_width=3)
    res = phase(jax.random.PRNGKey(0), {"w": jnp.zeros(2)},
                sample_fn(jax.random.PRNGKey(9), None), jnp.ones((3, 3)),
                jnp.array([1.0]), jnp.array(1.0))
    # would be 0.025 after two halvings; the floor catches the second
    assert float(res.lr) == pytest.approx(0.04)


def test_adam_phase_zero_epochs():
    """An L-BFGS-only stage (adam_epochs=0) must pass through cleanly:
    empty history, params untouched."""
    def loss_fn(params, data, lw, ref):
        loss = jnp.sum((params["w"] - data["target"]) ** 2)
        return loss / ref, jnp.stack([loss, loss, loss])

    def sample_fn(key, F):
        return {"target": jnp.full((2,), 5.0) + 0.0 * F[0, 0]}

    cfg = optim.AdamConfig(epochs=0, lr=0.05, tail_max=50)
    phase = optim.make_adam_phase(loss_fn, sample_fn, None, cfg, info_width=3)
    params = {"w": jnp.ones(2)}
    data = sample_fn(jax.random.PRNGKey(0), jnp.ones((3, 3)))
    res = phase(jax.random.PRNGKey(1), params, data, jnp.ones((3, 3)),
                jnp.array([1.0]), jnp.array(1.0))
    assert int(res.n_valid) == 0
    assert res.history.shape[0] == 0
    np.testing.assert_allclose(np.asarray(res.params["w"]), 1.0)


def test_adam_phase_resume_off_grid():
    """Resuming from a step that is not on this run's chunk grid issues a
    catch-up dispatch instead of raising (the saver may have used a
    different log cadence)."""
    def loss_fn(params, data, lw, ref):
        loss = jnp.sum((params["w"] - data["target"]) ** 2)
        return loss / ref, jnp.stack([loss, loss, loss])

    def sample_fn(key, F):
        return {"target": jnp.full((2,), 5.0) + 0.0 * F[0, 0]}

    cfg = optim.AdamConfig(epochs=100, lr=0.05, tail_max=0)
    phase = optim.make_adam_phase(loss_fn, sample_fn, None, cfg, info_width=3)
    params = {"w": jnp.zeros(2)}
    data = sample_fn(jax.random.PRNGKey(0), jnp.ones((3, 3)))
    state0 = phase.make_state0(jax.random.PRNGKey(1), params, data,
                               jnp.ones((3, 3)), jnp.array(1.0))
    # pretend a checkpoint saved at step 37 (off every grid)
    hist0 = jnp.ones((100, 3))
    res = phase(jax.random.PRNGKey(1), params, data, jnp.ones((3, 3)),
                jnp.array([1.0]), jnp.array(1.0),
                init=(37, state0, hist0))
    assert int(res.n_valid) == 100
    hist = np.asarray(res.history)
    assert hist.shape[0] == 100
    np.testing.assert_allclose(hist[:37], 1.0)  # replayed rows kept


def _multileaf_phase(layout, epochs=120):
    """Adam phase over a 4-leaf nested pytree (mimics a small MLP)."""

    def loss_fn(params, data, lw, ref):
        pred = jnp.tanh(data["x"] @ params["l1"]["w"] + params["l1"]["b"])
        pred = pred @ params["l2"]["w"] + params["l2"]["b"]
        loss = jnp.mean((pred - data["y"]) ** 2)
        return loss / ref, jnp.stack([loss, loss, lw[0] * loss])

    def sample_fn(key, F):
        x = jax.random.uniform(key, (32, 3)) + 0.0 * F[0, 0]
        return {"x": x, "y": jnp.sin(x.sum(axis=1, keepdims=True))}

    cfg = optim.AdamConfig(epochs=epochs, lr=0.02, resample_every=15,
                           plateau_every=40, tail_max=30, log_every=10,
                           layout=layout)
    phase = optim.make_adam_phase(loss_fn, sample_fn, None, cfg,
                                  info_width=3)
    k = jax.random.PRNGKey(7)
    ks = jax.random.split(k, 4)
    params = {
        "l1": {"w": jax.random.normal(ks[0], (3, 8)) * 0.5,
               "b": jnp.zeros(8)},
        "l2": {"w": jax.random.normal(ks[1], (8, 1)) * 0.5,
               "b": jnp.zeros(1)},
    }
    data = sample_fn(ks[2], jnp.ones((3, 3)))
    res = phase(ks[3], params, data, jnp.ones((3, 3)),
                jnp.array([1.0]), jnp.array(1.0))
    return res, phase, params, data


def test_adam_flat_layout_matches_tree():
    """AdamConfig.layout="flat" rides one raveled vector; the math is
    identical to the per-leaf layout (Adam is elementwise), so the
    trajectories must agree to float32 ulps — the only divergence source
    is XLA fusing the unravel-reshaped graph differently (different
    reduction rounding inside the matmuls), measured ~1 ulp/step."""
    res_f, *_ = _multileaf_phase("flat")
    res_t, *_ = _multileaf_phase("tree")
    # pytree structure is preserved by the flat layout (callers never see
    # the vector)
    assert (jax.tree_util.tree_structure(res_f.params)
            == jax.tree_util.tree_structure(res_t.params))
    for a, b in zip(jax.tree_util.tree_leaves(res_f.params),
                    jax.tree_util.tree_leaves(res_t.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    n = int(res_t.n_valid)
    assert int(res_f.n_valid) == n
    np.testing.assert_allclose(np.asarray(res_f.history)[:n],
                               np.asarray(res_t.history)[:n],
                               rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res_f.lr), np.asarray(res_t.lr),
                               rtol=1e-6)


def test_adam_flat_layout_rejects_structure_swap():
    """One flat-layout factory serves one params structure."""
    _, phase, params, data = _multileaf_phase("flat", epochs=5)
    other = {"w": jnp.zeros(4)}
    with pytest.raises(ValueError, match="one phase factory"):
        phase.make_state0(jax.random.PRNGKey(0), other, data,
                          jnp.ones((3, 3)), jnp.array(1.0))


def test_adam_layout_validation():
    with pytest.raises(ValueError, match="layout"):
        optim.AdamConfig(epochs=1, layout="bogus")
