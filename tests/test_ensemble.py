"""Ensemble training + serving: K seed-varied members, convex combination,
one correction of the mean (tpinn/core/ensemble.py; no reference analog —
the reference is single-net single-seed, software.py:1142-1201)."""

import dataclasses
import json

import numpy as np
import pytest

from tpinn import problems
from tpinn.core.ensemble import run_ensemble_training
from tpinn.core.train import StageSpec, TrainSpec


def _spec(**kw):
    st = StageSpec(depth=2, width=24, scl=1.0, epsil=1.0,
                   adam_epochs=300, lbfgs_epochs=200)
    return TrainSpec(
        n_col=256, n_band=64, n_adaptive=64, n_bd=32,
        testing_size=(128,), lw=(1.0, 0.0), grid=41,
        stages=(st,), density_every=100, plateau_every=200,
        tail_max=50, lsq_polish="auto", **kw,
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = tmp_path_factory.mktemp("ens")
    problem = problems.with_hard_bc(problems.poisson_1d())
    res = run_ensemble_training(
        problem, _spec(deflation="full"), n_members=2, seeds=(3, 4),
        output_dir=str(out))
    return out, res


def test_ensemble_beats_or_matches_members(trained):
    out, res = trained
    assert len(res.members) == 2
    assert all(r is not None for r in res.rel_l2_members)
    assert res.rel_l2 is not None and np.isfinite(res.rel_l2)
    # the combination must never be (much) worse than the best member;
    # with the correction it should be at least as good
    assert res.rel_l2 <= min(res.rel_l2_members) * 1.5, (
        res.rel_l2, res.rel_l2_members)
    # convex weights
    assert abs(float(np.sum(res.weights)) - 1.0) < 1e-9
    # distinct seeds actually trained distinct nets
    assert res.err_correlation is not None
    assert res.err_correlation[0][1] < 0.999999


def test_ensemble_record_and_member_checkpoints(trained):
    out, res = trained
    rec = json.loads((out / "ensemble.json").read_text())
    assert rec["problem"] == "poisson_1d"
    assert len(rec["members"]) == 2
    assert rec["rel_l2"] == pytest.approx(res.rel_l2)
    for m in rec["members"]:
        assert (out / m).exists(), m
    # member checkpoints carry NO per-member correction (it applies once,
    # to the mean)
    raw = np.load(out / rec["members"][0])
    meta = json.loads(bytes(raw["__meta__"]).decode())
    assert meta.get("deflation") in (None, {})


def test_ensemble_predict_callable(trained):
    out, res = trained
    import jax.numpy as jnp

    z = jnp.linspace(0.05, 0.95, 33)[:, None]
    u = np.asarray(res.predict(z))
    assert u.shape == (33, 1)
    exact = np.asarray(problems.poisson_1d().exact(z))
    rel = np.linalg.norm(u - exact) / np.linalg.norm(exact)
    assert rel < 5e-2, rel


def test_serving_loads_ensemble_record(trained):
    out, res = trained
    from tpinn.app.serve import PINNServer

    srv = PINNServer(str(out), "poisson_1d")
    pts = [[0.3], [0.62]]
    u = srv.predict(pts)
    import jax.numpy as jnp

    want = np.asarray(res.predict(jnp.asarray(pts, jnp.float32)))[:, 0]
    np.testing.assert_allclose(np.asarray(u), want, rtol=0, atol=1e-5)
    f = srv.residual(pts)
    assert np.all(np.isfinite(f))
    # epistemic UQ: member spread is positive and small relative to u
    std = np.asarray(srv.uncertainty(pts))
    assert std.shape == (2,) and np.all(std >= 0)
    assert np.all(std < 0.2 * (np.abs(want) + 1e-3))


def test_uncertainty_requires_ensemble(tmp_path):
    import dataclasses

    from tpinn import problems
    from tpinn.app.serve import PINNServer
    from tpinn.core import train

    spec = train.TrainSpec(
        n_col=128, n_band=0, n_adaptive=0, n_bd=8, testing_size=(64,),
        lw=(1.0, 0.0), grid=32,
        stages=(train.StageSpec(depth=2, width=8, adam_epochs=30,
                                lbfgs_epochs=0),),
        log_every=30,
    )
    train.run_training(problems.poisson_1d(), spec,
                       output_dir=str(tmp_path))
    srv = PINNServer(str(tmp_path / "params_stage_1.npz"), "poisson_1d")
    with pytest.raises(ValueError, match="ensemble"):
        srv.uncertainty([[0.5]])


def test_ensemble_seed_mismatch_raises():
    problem = problems.poisson_1d()
    with pytest.raises(ValueError, match="seeds"):
        run_ensemble_training(problem, _spec(), n_members=3, seeds=(1, 2))
