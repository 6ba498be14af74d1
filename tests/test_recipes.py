"""The shipped best-known recipes (tpinn/problems/recipes.py) are coherent:
every preset has one, it builds a valid (ProblemSpec, TrainSpec) pair, and
a shrunken recipe trains end-to-end."""

import dataclasses

import numpy as np
import pytest

from tpinn import problems
from tpinn.core import train
from tpinn.problems.recipes import RECIPES, get_recipe


def test_every_preset_has_a_recipe():
    assert set(RECIPES) == set(problems.PRESETS)


@pytest.mark.parametrize("name", sorted(problems.PRESETS))
def test_recipe_builds(name):
    problem, spec = get_recipe(name)
    assert problem.name == name
    assert len(spec.stages) >= 1
    assert RECIPES[name].hard_bc == (problem.hard_bc is not None)
    # gate-class unless explicitly provisional (hard benchmarks still
    # being campaigned carry their best MEASURED value, honestly < 1)
    cap = 1.0 if RECIPES[name].provisional else 1e-2
    assert 0 < RECIPES[name].expected_rel_l2 < cap
    # 1-D problems must carry a 1-D evaluation grid
    assert len(spec.testing_size) == problem.dim


def _shrink(spec):
    stages = tuple(
        dataclasses.replace(
            s, adam_epochs=60, lbfgs_epochs=30, lbfgs_rounds=1,
            lbfgs_grid=min(s.lbfgs_grid, 20) if s.lbfgs_grid else 0)
        for s in spec.stages)
    return dataclasses.replace(
        spec, stages=stages, n_col=300, n_band=80, n_adaptive=80, n_bd=40,
        grid=31, testing_size=(24,) * len(spec.testing_size), tail_max=0)


def test_shrunken_annulus_recipe_trains():
    problem, spec = get_recipe("annulus_laplace")
    res = train.run_training(problem, _shrink(spec), print_log=False)
    assert res.rel_l2 is not None and np.isfinite(res.rel_l2)


def test_shrunken_march_recipe_trains():
    # exercises the march dispatch (Recipe.march > 0, the convection fix)
    from tpinn.core.march import run_time_marching

    problem, spec = get_recipe("convection_1d")
    assert RECIPES["convection_1d"].march > 0
    assert problem.hard_bc is None          # soft IC handoff required
    res = run_time_marching(problem, _shrink(spec), 2, print_log=False)
    assert res.rel_l2 is not None and np.isfinite(res.rel_l2)


def test_shrunken_helmholtz_recipe_trains():
    # exercises the curriculum shape: per-stage equation + warm start
    problem, spec = get_recipe("helmholtz_2d")
    res = train.run_training(problem, _shrink(spec), print_log=False)
    assert res.rel_l2 is not None and np.isfinite(res.rel_l2)
