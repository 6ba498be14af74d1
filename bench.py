"""Benchmark: collocation points/sec/chip on the flagship training step.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "pts/s", "vs_baseline": N}

Setup (matches the reference's smoke-config scale, BASELINE.md):
- problem: annulus Laplace (the reference's problem), via the symbolic
  compiler — nothing hardcoded,
- batch: 3000 uniform + 1000 boundary-band + 1000 adaptive + 2×100 BC
  points = 5200 collocation points per step,
- net: 6 hidden × 60 units tanh (the reference __main__'s effective net,
  software.py:1172-1175 after the depth/width swap),
- step: full Adam training step (residual + BC losses, grad, optax update)
  with on-device resampling — executed as the scanned on-chip phase.

Baseline: the reference solver itself cannot run here (tensorflow-
probability and pyDOE are not installed), so the baseline is measured from
tpinn.core.refmode — a faithful reimplementation of its hot-path semantics
(float64, reverse-over-reverse vectgrad residual, one jitted Adam step per
Python-loop iteration) pinned to CPU, per BASELINE.md's "measure from the
reference solver (CPU)" instruction.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_COL, N_BAND, N_ADAPT, N_BD = 3000, 1000, 1000, 100
DEPTH, WIDTH = 6, 60
BATCH = N_COL + N_BAND + N_ADAPT + 2 * N_BD   # 5200


def _enable_compile_cache():
    """Persistent compilation cache: bench re-runs skip the (slow, tunneled)
    TPU compile."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def build(dtype):
    import jax
    import jax.numpy as jnp

    from tpinn import problems
    from tpinn.core import loss as loss_mod
    from tpinn.core import net, pde, sample, train

    problem = problems.annulus_laplace()
    compiled = pde.compile_pde(problem.equation, problem.coords)
    fm = net.feature_map_for(problem.feature_kinds)
    spec = net.MLPSpec(depth=DEPTH, width=WIDTH)
    params = net.init_params(jax.random.PRNGKey(0), spec, fm, dtype)
    predictor = net.make_predictor(
        spec, fm, jnp.asarray(problem.lb, dtype), jnp.asarray(problem.ub, dtype)
    )
    cfg = sample.SamplerConfig(n_col=N_COL, n_band=N_BAND, n_adaptive=N_ADAPT,
                               n_bd=N_BD)
    sample_fn, grids = sample.make_sampler(
        cfg, problem.bc_groups, problem.lb, problem.ub, dtype
    )
    return problem, compiled, params, predictor, sample_fn, grids


def bench_tpu(steps=400):
    """Scanned Adam phase on the default device (TPU when present)."""
    import jax
    import jax.numpy as jnp

    from tpinn.core import loss as loss_mod
    from tpinn.core import optim, train

    problem, compiled, params, predictor, sample_fn, grids = build(jnp.float32)
    loss_fn = loss_mod.make_loss(predictor, compiled)
    density_fn = train.make_density_fn(predictor, compiled, grids)
    cfg = optim.AdamConfig(epochs=steps, resample_every=100,
                           density_every=2000, plateau_every=4000, tail_max=0)
    phase = optim.make_adam_phase(
        loss_fn, sample_fn, density_fn, cfg,
        info_width=loss_mod.loss_info_width(2),
    )
    F0 = jnp.ones_like(grids[0])
    data0 = sample_fn(jax.random.PRNGKey(1), F0)
    lw = jnp.array([0.05, 0.0], jnp.float32)
    ref = jnp.array(1.0, jnp.float32)

    # warmup/compile
    res = phase(jax.random.PRNGKey(2), params, data0, F0, lw, ref)
    jax.block_until_ready(res.params)

    t0 = time.perf_counter()
    res = phase(jax.random.PRNGKey(3), params, data0, F0, lw, ref)
    jax.block_until_ready(res.params)
    dt = time.perf_counter() - t0
    pts_per_sec = steps * BATCH / dt
    dev = jax.devices()[0]
    print(f"[bench] device={dev} steps={steps} batch={BATCH} "
          f"time={dt:.3f}s -> {pts_per_sec:,.0f} pts/s", file=sys.stderr)
    return pts_per_sec


_BASELINE_SNIPPET = r"""
import time, sys, json
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from tpinn import problems
from tpinn.core import net, refmode, sample

problem = problems.annulus_laplace()
fm = net.feature_map_for(problem.feature_kinds)
spec = net.MLPSpec(depth={depth}, width={width})
params = net.init_params(jax.random.PRNGKey(0), spec, fm, jnp.float64)
predictor = net.make_predictor(
    spec, fm, jnp.asarray(problem.lb, jnp.float64),
    jnp.asarray(problem.ub, jnp.float64))
cfg = sample.SamplerConfig(n_col={n_col}, n_band={n_band},
                           n_adaptive={n_adapt}, n_bd={n_bd})
sample_fn, grids = sample.make_sampler(
    cfg, problem.bc_groups, problem.lb, problem.ub, jnp.float64)
data = sample_fn(jax.random.PRNGKey(1), jnp.ones_like(grids[0]))
loss_fn = refmode.make_reference_loss(predictor)
opt, step = refmode.make_reference_adam_step(loss_fn)
opt_state = opt.init(params)
lw = jnp.array([0.05, 0.0]); ref = jnp.array(1.0)
params, opt_state, info = step(params, opt_state, data, lw, ref)
jax.block_until_ready(info)          # compile
n = {steps}
t0 = time.perf_counter()
for _ in range(n):                   # per-step dispatch, as the reference runs
    params, opt_state, info = step(params, opt_state, data, lw, ref)
jax.block_until_ready(info)
dt = time.perf_counter() - t0
print(json.dumps({{"pts_per_sec": n * {batch} / dt, "secs": dt}}))
"""


def bench_cpu_reference(steps=30):
    """Reference-semantics baseline in a subprocess (isolated x64 config)."""
    code = _BASELINE_SNIPPET.format(
        repo=os.path.dirname(os.path.abspath(__file__)),
        depth=DEPTH, width=WIDTH, n_col=N_COL, n_band=N_BAND,
        n_adapt=N_ADAPT, n_bd=N_BD, steps=steps, batch=BATCH,
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800,
    )
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError("baseline subprocess failed")
    line = out.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    print(f"[bench] cpu-reference baseline: {result['pts_per_sec']:,.0f} pts/s "
          f"({result['secs']:.2f}s for {steps} steps)", file=sys.stderr)
    return result["pts_per_sec"]


def main():
    _enable_compile_cache()
    baseline = bench_cpu_reference()
    value = bench_tpu()
    print(json.dumps({
        "metric": "collocation_pts_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "pts/s",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()
