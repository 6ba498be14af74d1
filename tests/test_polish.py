"""float64 L-BFGS polish: runs in a subprocess because enabling jax x64 is
process-global and would poison other tests' dtypes."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

SCRIPT = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, __ROOT__)
import dataclasses
from tpinn import problems
from tpinn.core import train
from tpinn.core.train import StageSpec, TrainSpec

spec = TrainSpec(
    n_col=512, n_band=0, n_adaptive=64, n_bd=64, testing_size=(128,),
    lw=(1.0, 0.0), grid=101,
    stages=(StageSpec(depth=3, width=32, scl=1.0, epsil=1.0,
                      adam_epochs=800, lbfgs_epochs=900),),
    density_every=400, plateau_every=800, tail_max=100,
    lbfgs_dtype="float64",
)
res = train.run_training(problems.poisson_1d(), spec)
# params are cast back to the training dtype after the polish so later
# stages keep uniform carry types
leaf = jax.tree_util.tree_leaves(res.stages[0].params)[0]
print(json.dumps({"rel_l2": res.rel_l2, "dtype": str(leaf.dtype)}))
"""


@pytest.mark.slow
def test_f64_polish_subprocess():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.replace("__ROOT__", repr(str(ROOT)))],
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["dtype"] == "float32"
    # modest budget still reaches well below 1e-3; full budgets reach 8e-6
    assert rec["rel_l2"] < 1e-3, rec
