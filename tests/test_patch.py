"""Overlapping-patch decomposition (tpinn.core.patch, FBPINN-style).

The headline property: on a high-frequency Poisson problem the patched
predictor SOLVES what a single net of the same total size cannot at the
same budget (measured while building: 8× 2x16 patches 4.6e-3 vs single
2x64 rel-L2 1.12 at identical 15k+4.5k budgets — the single net never
leaves the O(1)-error regime).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.core import sample
from tpinn.core.patch import (PatchSpec, init_patch_params,
                              make_patch_predictor, patch_geometry,
                              run_patched)
from tpinn.core.train import ProblemSpec, StageSpec, TrainSpec

PI = np.pi


def _hf_poisson(w):
    return ProblemSpec(
        name="hf_poisson", equation=f"u_xx + {w * w}*sin({w}*x)",
        coords=("x",), lb=(0.0,), ub=(1.0,),
        bc_groups=(sample.BCGroup(lo=(0.0,), hi=(0.0,), value=0.0),
                   sample.BCGroup(lo=(1.0,), hi=(1.0,), value=0.0)),
        exact=lambda z: jnp.sin(w * z),
    )


def test_patch_geometry():
    c, h = patch_geometry(PatchSpec(n=(4,), overlap=0.5), (0.0,), (1.0,))
    np.testing.assert_allclose(np.asarray(c)[:, 0],
                               [0.125, 0.375, 0.625, 0.875])
    assert float(h[0]) == pytest.approx(0.1875)  # 1.5 cells / 2
    c2, h2 = patch_geometry(PatchSpec(n=(2, 3), overlap=0.5),
                            (0.0, -1.0), (1.0, 2.0))
    assert c2.shape == (6, 2) and h2.shape == (2,)
    with pytest.raises(ValueError):
        patch_geometry(PatchSpec(n=(2,)), (0.0, 0.0), (1.0, 1.0))


def test_partition_of_unity_positive_and_local():
    """The window sum is positive everywhere (no dead zones), and at a
    patch CENTER only that patch contributes — the predictor there equals
    the patch's own net output exactly."""
    spec = PatchSpec(n=(8,), overlap=0.5)
    mspec_kw = dict(depth=2, width=8)
    from tpinn.core import net

    mspec = net.MLPSpec(**mspec_kw)
    pred = make_patch_predictor(mspec, spec, (0.0,), (1.0,))
    params = init_patch_params(jax.random.PRNGKey(0), mspec, spec)
    z = jnp.linspace(0.0, 1.0, 257)[:, None]
    u = pred(params, z)
    assert np.all(np.isfinite(np.asarray(u)))

    centers, half = pred.tpinn_patch
    fm = net.feature_map_for((net.MINMAX,))
    for p in (0, 3, 7):
        zc = centers[p][None, :]
        lo, hi = centers[p] - half, centers[p] + half
        own = mspec.epsil * net.mlp_apply(
            jax.tree.map(lambda a: a[p], params), fm(zc, lo, hi), mspec)
        np.testing.assert_allclose(np.asarray(pred(params, zc)),
                                   np.asarray(own), rtol=1e-6)


def test_patch_predictor_is_differentiable():
    # the composite rides the generic forward-mode engine: second
    # derivatives through vmap + window product must be finite
    from tpinn.core import net, pde

    spec = PatchSpec(n=(3,), overlap=0.5)
    mspec = net.MLPSpec(depth=2, width=8)
    pred = make_patch_predictor(mspec, spec, (0.0,), (1.0,))
    params = init_patch_params(jax.random.PRNGKey(1), mspec, spec)
    compiled = pde.compile_pde("u_xx + u", ("x",))
    z = jnp.linspace(0.05, 0.95, 33)[:, None]
    f = compiled.residual_fast(pred, params, z)
    assert f.shape == (33, 1) and np.all(np.isfinite(np.asarray(f)))


@pytest.mark.slow
def test_patched_solves_what_single_net_cannot():
    """High-frequency Poisson u = sin(15πx): the 8-patch decomposition
    converges where the same-budget single net of equal total width
    plateaus at O(1) error (the FBPINN result)."""
    w = 15 * PI
    prob = _hf_poisson(w)
    spec = TrainSpec(
        n_col=2048, n_band=0, n_adaptive=0, n_bd=32, testing_size=(512,),
        lw=(1e-5, 0.0), grid=128, pad_features=3,
        stages=(StageSpec(depth=2, width=16, scl=2.0, epsil=1.0,
                          adam_epochs=15000, lbfgs_epochs=4500),),
        log_every=5000, density_every=10**9, plateau_every=3000,
    )
    r = run_patched(prob, spec, PatchSpec(n=(8,), overlap=0.5))
    assert r.n_patches == 8
    assert r.rel_l2 is not None and r.rel_l2 < 2e-2, r.rel_l2


def test_patched_runs_on_points_mesh():
    """Point batches shard over the virtual 8-device mesh; the stacked
    patch pytree stays replicated — the run compiles and trains."""
    from tpinn import parallel

    mesh = parallel.make_mesh()
    prob = _hf_poisson(4 * PI)
    spec = TrainSpec(
        n_col=256, n_band=0, n_adaptive=0, n_bd=16, testing_size=(128,),
        lw=(1e-4, 0.0), grid=64, pad_features=3,
        stages=(StageSpec(depth=2, width=8, scl=1.0, epsil=1.0,
                          adam_epochs=200, lbfgs_epochs=60),),
        log_every=200, density_every=10**9, plateau_every=10**9,
    )
    r = run_patched(prob, spec, PatchSpec(n=(4,), overlap=0.5), mesh=mesh)
    assert r.rel_l2 is not None and np.isfinite(r.rel_l2)


def test_patched_checkpoint(tmp_path):
    prob = _hf_poisson(2 * PI)
    spec = TrainSpec(
        n_col=128, n_band=0, n_adaptive=0, n_bd=8, testing_size=(64,),
        lw=(1e-3, 0.0), grid=32,
        stages=(StageSpec(depth=2, width=8, scl=1.0, epsil=1.0,
                          adam_epochs=50, lbfgs_epochs=0),),
        log_every=50, density_every=10**9, plateau_every=10**9,
    )
    r = run_patched(prob, spec, PatchSpec(n=(2,), overlap=0.5),
                    output_dir=str(tmp_path))
    assert (tmp_path / "params_stage_1.npz").exists()
    import json

    rec = json.loads((tmp_path / "patched.json").read_text())
    assert rec["n_patches"] == 2 and rec["n"] == [2]


def test_patched_rejects_hard_bc():
    import dataclasses

    prob = dataclasses.replace(_hf_poisson(2 * PI),
                               hard_bc=("0", "x*(1-x)"))
    spec = TrainSpec(n_col=64, n_band=0, n_adaptive=0, n_bd=8,
                     stages=(StageSpec(depth=2, width=8, adam_epochs=10,
                                       lbfgs_epochs=0),))
    with pytest.raises(ValueError, match="hard_bc"):
        run_patched(prob, spec, PatchSpec(n=(2,)))


def test_patched_checkpoint_serves(tmp_path):
    """serve rebuilds the partition-of-unity predictor from the 'patch'
    meta and answers /predict-equivalent queries with the trained values."""
    prob = _hf_poisson(2 * PI)
    spec = TrainSpec(
        n_col=256, n_band=0, n_adaptive=0, n_bd=16, testing_size=(128,),
        lw=(1e-3, 0.0), grid=64,
        stages=(StageSpec(depth=2, width=12, scl=1.0, epsil=1.0,
                          adam_epochs=400, lbfgs_epochs=150),),
        log_every=400, density_every=10**9, plateau_every=10**9,
    )
    r = run_patched(prob, spec, PatchSpec(n=(4,), overlap=0.5),
                    output_dir=str(tmp_path))

    from tpinn.app.serve import PINNServer

    srv = PINNServer(str(tmp_path / "params_stage_1.npz"),
                     problem_name="poisson_1d")  # preset = metadata only
    z = np.linspace(0.1, 0.9, 9)[:, None]
    u_served = np.asarray(srv.predict(z.tolist()))
    u_train = np.asarray(r.predict(jnp.asarray(z, jnp.float32)))[:, 0]
    np.testing.assert_allclose(u_served, u_train, rtol=1e-5, atol=1e-6)


def test_patch_parallel_over_ensemble_axis():
    """PATCH-PARALLELISM: the stacked params shard over the mesh's
    'ensemble' axis (2 groups x 4-way points-DP on the virtual 8-device
    mesh) and the training gradient matches the single-device run to f32
    tolerance — the window sum's psum is inserted by XLA, not hand-coded."""
    from tpinn import parallel
    from tpinn.core import loss as loss_mod
    from tpinn.core import net, pde

    mesh = parallel.make_mesh(ensemble=2)
    prob = _hf_poisson(4 * PI)
    compiled = pde.compile_pde(prob.equation, prob.coords)
    mspec = net.MLPSpec(depth=2, width=8)
    pspec = PatchSpec(n=(4,), overlap=0.5)
    pred = make_patch_predictor(mspec, pspec, prob.lb, prob.ub)
    params = init_patch_params(jax.random.PRNGKey(0), mspec, pspec)
    loss_fn = loss_mod.make_loss(pred, compiled)

    cfg = sample.SamplerConfig(n_col=64, n_band=0, n_adaptive=0, n_bd=8,
                               grid=17)
    sample_fn, grids = sample.sampler_for(cfg, prob.bc_groups, prob.lb,
                                          prob.ub)
    data = sample_fn(jax.random.PRNGKey(1), jnp.ones_like(grids[0]))
    lw = jnp.asarray([1e-4, 0.0])
    ref = jnp.asarray(1.0)

    g_single = jax.grad(lambda p: loss_fn(p, data, lw, ref)[0])(params)

    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("ensemble"))
    params_sh = jax.tree.map(lambda a: jax.device_put(a, sh), params)
    ploss = parallel.make_parallel_loss(loss_fn, mesh)
    data_sh = parallel.shard_data(data, mesh)
    g_shard = jax.jit(jax.grad(lambda p: ploss(p, data_sh, lw, ref)[0]))(
        params_sh)

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_shard)):
        na = np.linalg.norm(np.asarray(a).ravel())
        dev = (np.linalg.norm((np.asarray(a) - np.asarray(b)).ravel())
               / (na + 1e-30))
        assert dev < 1e-5, dev

    # and the full training loop runs with the sharded layout
    spec = TrainSpec(
        n_col=64, n_band=0, n_adaptive=0, n_bd=8, testing_size=(64,),
        lw=(1e-4, 0.0), grid=17,
        stages=(StageSpec(depth=2, width=8, scl=1.0, epsil=1.0,
                          adam_epochs=100, lbfgs_epochs=30),),
        log_every=100, density_every=10**9, plateau_every=10**9,
    )
    lines = []
    r = run_patched(prob, spec, pspec, mesh=mesh, log_fn=lines.append)
    assert any("sharded over 2 ensemble-axis groups" in ln for ln in lines)
    assert r.rel_l2 is not None and np.isfinite(r.rel_l2)


def test_patched_resume(tmp_path):
    """resume=True short-circuits a finished run (params reloaded, no
    retraining) and picks a killed run back up from the mid-Adam
    checkpoint — the same contract train.run_training honours."""
    prob = _hf_poisson(2 * PI)
    spec = TrainSpec(
        n_col=128, n_band=0, n_adaptive=0, n_bd=8, testing_size=(64,),
        lw=(1e-3, 0.0), grid=32, checkpoint_every=20,
        stages=(StageSpec(depth=2, width=8, scl=1.0, epsil=1.0,
                          adam_epochs=50, lbfgs_epochs=0),),
        log_every=50, density_every=10**9, plateau_every=10**9,
    )
    pspec = PatchSpec(n=(2,), overlap=0.5)
    r1 = run_patched(prob, spec, pspec, output_dir=str(tmp_path))
    assert (tmp_path / "adam_state_stage_1.npz").exists()

    # Finished run: resume skips training and reproduces the metric.
    r2 = run_patched(prob, spec, pspec, output_dir=str(tmp_path),
                     resume=True)
    assert r2.history.shape[0] == 0  # nothing retrained
    assert r2.rel_l2 == pytest.approx(r1.rel_l2, rel=1e-6)

    # Killed run: final params gone, mid-Adam state present — resume
    # restarts from the last saved chunk instead of step 0.
    (tmp_path / "params_stage_1.npz").unlink()
    r3 = run_patched(prob, spec, pspec, output_dir=str(tmp_path),
                     resume=True)
    assert np.isfinite(r3.rel_l2)
    assert (tmp_path / "params_stage_1.npz").exists()
