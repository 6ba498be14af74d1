"""Compiled (non-interpret) Pallas kernel check + engine microbenchmark.

Runs on the attached accelerator (TPU): asserts forward/backward parity of
the fused Pallas kernels against the pure-JAX engines, then times the full
training step under each loss engine.  Used by the tpu-marked test
(subprocess) and consulted for the engine-dispatch default.

    python scripts/kernel_tpu_check.py [--json out.json]

NOTE (timing): jax.block_until_ready does NOT reliably block through the
tunneled TPU attachment — every timed section syncs via a host transfer.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def median_time(fn, sync, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        sync(out)  # host transfer: the only reliable fence here
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", default=None)
    p.add_argument("--batch", type=int, default=5200)
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )

    from tpinn import problems
    from tpinn.core import loss as loss_mod
    from tpinn.core import net, pde
    from tpinn.kernels.taylor_vjp import make_kernel_partials

    problem = problems.annulus_laplace()
    compiled = pde.compile_pde(problem.equation, problem.coords)
    fm = net.feature_map_for(problem.feature_kinds)
    spec = net.MLPSpec(depth=6, width=60)
    params = net.init_params(jax.random.PRNGKey(0), spec, fm, jnp.float32)
    lb = jnp.asarray(problem.lb, jnp.float32)
    ub = jnp.asarray(problem.ub, jnp.float32)
    predictor = net.make_predictor(spec, fm, lb, ub)
    z = jax.random.uniform(jax.random.PRNGKey(1), (args.batch, 2),
                           minval=0.15, maxval=0.95)
    report = {"device": str(jax.devices()[0]), "batch": args.batch}

    # ---------- compiled parity: forward ----------
    kp = make_kernel_partials(spec, fm, lb, ub, compiled.indices)
    parts_k = jax.jit(lambda p, zz: kp(p, zz, compiled.indices))(params, z)
    parts_r = jax.jit(
        lambda p, zz: predictor.tpinn_partials(p, zz, compiled.indices)
    )(params, z)
    fwd_err = max(
        float(jnp.max(jnp.abs(parts_k[ix] - parts_r[ix])))
        for ix in compiled.indices
    )
    report["fwd_max_abs_err"] = fwd_err
    assert fwd_err < 1e-4, f"forward kernel parity fail: {fwd_err}"

    # ---------- compiled parity: backward (training gradient) ----------
    def loss_k(p):
        return jnp.mean(compiled.evaluate(z, kp(p, z, compiled.indices)) ** 2)

    def loss_r(p):
        return jnp.mean(compiled.residual_fast(predictor, p, z) ** 2)

    try:
        g_k = jax.jit(jax.grad(loss_k))(params)
        g_r = jax.jit(jax.grad(loss_r))(params)
        flat = lambda t: jnp.concatenate(
            [x.ravel() for x in jax.tree_util.tree_leaves(t)]
        )
        gk, gr = flat(g_k), flat(g_r)
        denom = float(jnp.max(jnp.abs(gr))) or 1.0
        bwd_err = float(jnp.max(jnp.abs(gk - gr))) / denom
        report["bwd_max_rel_err"] = bwd_err
        assert bwd_err < 2e-3, f"backward kernel parity fail: {bwd_err}"
    except jax.errors.JaxRuntimeError as e:
        # Known runtime limitation of the tunneled attachment: the remote
        # Mosaic compile helper rejects the backward kernel (exit 1, no
        # diagnostics forwarded) while the forward kernel compiles and
        # runs.  Report it instead of failing the whole check — the
        # backward parity IS covered in interpret mode (tests/test_kernels)
        # and the training step uses the XLA engines.
        report["bwd_compile_error"] = str(e).splitlines()[0][:200]
        print(f"[kernel-check] backward kernel compile rejected by this "
              f"runtime: {report['bwd_compile_error']}", file=sys.stderr)

    # ---------- training-step microbenchmark per engine ----------
    data = {
        "x_col": z,
        "x_bd": [
            jnp.stack([jnp.full((100,), 0.1), jnp.linspace(0, 1, 100)], 1),
            jnp.stack([jnp.full((100,), 1.0), jnp.linspace(0, 1, 100)], 1),
        ],
        "u_bd": [jnp.ones((100, 1)), jnp.zeros((100, 1))],
    }
    lw = jnp.array([0.05, 0.0])
    ref = jnp.array(1.0)
    opt = optax.adam(1e-3)

    def make_step(engine):
        lf = loss_mod.make_loss(predictor, compiled, engine=engine)

        @partial(jax.jit, static_argnums=2)
        def run(params, opt_state, n):
            def body(carry, _):
                params, opt_state = carry
                grads, info = jax.grad(lf, has_aux=True)(params, data, lw, ref)
                updates, opt_state = opt.update(grads, opt_state)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), info[0]

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=n
            )
            return params, opt_state, losses[-1]

        return run

    engines = {}
    for engine in ("auto", "fused", "kernel"):
        try:
            step = make_step(engine)
            opt_state = opt.init(params)
            out = step(params, opt_state, args.steps)
            float(out[2])  # compile + sync
            dt = median_time(
                lambda: step(params, opt_state, args.steps),
                lambda o: float(o[2]),
            )
            pts_s = args.steps * args.batch / dt
            engines[engine] = {
                "ms_per_step": round(dt / args.steps * 1e3, 4),
                "pts_per_sec": round(pts_s, 0),
            }
            print(f"[kernel-check] engine={engine}: "
                  f"{dt / args.steps * 1e3:.3f} ms/step, "
                  f"{pts_s:,.0f} pts/s", file=sys.stderr)
        except Exception as e:  # pragma: no cover - accelerator-specific
            engines[engine] = {"error": str(e).splitlines()[0][:200]}
            print(f"[kernel-check] engine={engine} FAILED: "
                  f"{str(e).splitlines()[0][:200]}", file=sys.stderr)
    report["engines"] = engines

    fastest = min(
        (k for k in engines if "pts_per_sec" in engines[k]),
        key=lambda k: engines[k]["ms_per_step"],
    )
    report["fastest_engine"] = fastest
    print(json.dumps(report))
    if args.json:
        Path(args.json).parent.mkdir(parents=True, exist_ok=True)
        Path(args.json).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
