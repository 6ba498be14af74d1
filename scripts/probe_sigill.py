"""Bisect the tunneled-TPU compiler SIGILL on the Helmholtz Adam graph.

Round-2 diagnostic: helmholtz_2d (and, at round-1 campaign time, all square
-domain presets) crash the remote tpu_compile_helper with SIGILL in the
Adam phase, while the annulus compiles and runs.  Each probe AOT-compiles
one graph piece (jit().lower().compile()) and reports ok/fail, so one
process can bisect down to the crashing construct.

    python scripts/probe_sigill.py            # full ladder
    python scripts/probe_sigill.py grad_hh    # one probe
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)

from tpinn import problems
from tpinn.core import loss as loss_mod
from tpinn.core import net, optim, pde, sample
from tpinn.core.train import make_density_fn

DTYPE = jnp.float32


def build(problem, n_col=256, n_band=64, n_adaptive=64, n_bd=32, grid=41,
          engine="generic", depth=3, width=32, pad=0):
    compiled = pde.compile_pde(problem.equation, problem.coords)
    source_fn = (pde.compile_coord_expr(problem.source, problem.coords)
                 if problem.source else None)
    feature_map = net.feature_map_for(problem.feature_kinds, pad_to=pad)
    lb = jnp.asarray(problem.lb, DTYPE)
    ub = jnp.asarray(problem.ub, DTYPE)
    mspec = net.MLPSpec(depth=depth, width=width, scl=1.0, epsil=1.0)
    key = jax.random.PRNGKey(0)
    params = net.init_params(key, mspec, feature_map, DTYPE)
    predictor = net.make_predictor(mspec, feature_map, lb, ub)
    cfg = sample.SamplerConfig(n_col=n_col, n_band=n_band,
                               n_adaptive=n_adaptive, n_bd=n_bd, grid=grid)
    if problem.dim == 1:
        sample_fn, grids = sample.make_sampler_1d(
            cfg, problem.bc_groups, problem.lb, problem.ub, DTYPE)
    else:
        sample_fn, grids = sample.make_sampler(
            cfg, problem.bc_groups, problem.lb, problem.ub, DTYPE)
    F0 = jnp.ones_like(grids[0])
    density_fn = make_density_fn(predictor, compiled, grids, source_fn)
    loss_fn = loss_mod.make_loss(predictor, compiled, source_fn,
                                 engine=engine)
    data0 = sample_fn(key, F0)
    lw = jnp.asarray((0.05, 0.0), DTYPE)
    ref = jnp.asarray(1.0, DTYPE)
    return dict(loss_fn=loss_fn, sample_fn=sample_fn, density_fn=density_fn,
                data0=data0, params=params, F0=F0, lw=lw, ref=ref, key=key,
                n_bc=len(problem.bc_groups))


def _replace_spec(problem, **kw):
    import dataclasses

    return dataclasses.replace(problem, **kw)


def _with_remat(b):
    b = dict(b)
    b["loss_fn"] = jax.checkpoint(b["loss_fn"])
    return b


def probe(name, thunk):
    t0 = time.perf_counter()
    try:
        thunk()
        print(f"[probe] {name}: OK ({time.perf_counter()-t0:.1f}s)",
              flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"[probe] {name}: FAIL ({time.perf_counter()-t0:.1f}s) {msg}",
              flush=True)
        return False


def compile_loss(b):
    jax.jit(b["loss_fn"]).lower(
        b["params"], b["data0"], b["lw"], b["ref"]).compile()


def compile_grad(b):
    g = jax.jit(jax.grad(lambda p, d, w, r: b["loss_fn"](p, d, w, r)[0]))
    g.lower(b["params"], b["data0"], b["lw"], b["ref"]).compile()


def compile_chunk(b, n_bc, n_steps=8, density=True, resample=True,
                  plateau=True, options=None):
    info_width = loss_mod.loss_info_width(n_bc)
    cfg = optim.AdamConfig(epochs=n_steps, lr=1e-3, log_every=10_000,
                           plateau_every=4000 if plateau else 0)
    phase = optim.make_adam_phase(
        b["loss_fn"], b["sample_fn"] if resample else None,
        b["density_fn"] if density else None,
        cfg, info_width, None)
    state = phase.make_state0(b["key"], b["params"], b["data0"], b["F0"],
                              b["ref"])
    lowered = phase.run_chunk.lower(
        state, b["lw"], b["ref"], jnp.int32(0), n_steps)
    if options:
        lowered.compile(compiler_options=options)
    else:
        lowered.compile()


def compile_scan_variant(b, aux=True, optimizer="adam", n_steps=8):
    """Minimal scan-over-update probes built outside make_adam_phase:
    isolate the history stacking (aux) and the optax graph."""
    import optax

    loss_fn = b["loss_fn"]
    grad_fn = jax.grad(loss_fn, has_aux=True)
    if optimizer == "adam":
        opt = optax.adam(1e-3)
    else:
        opt = optax.sgd(1e-3)
    opt_state0 = opt.init(b["params"])

    def body(carry, _):
        params, opt_state = carry
        grads, info = grad_fn(params, b["data0"], b["lw"], b["ref"])
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), (info if aux else None)

    def run(params, opt_state):
        return jax.lax.scan(body, (params, opt_state), None, length=n_steps)

    jax.jit(run).lower(b["params"], opt_state0).compile()


def compile_sampler(b):
    jax.jit(b["sample_fn"]).lower(b["key"], b["F0"]).compile()


def compile_density(b):
    jax.jit(b["density_fn"]).lower(b["params"]).compile()


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    print(f"backend: {jax.default_backend()}", flush=True)

    hh = lambda **kw: build(problems.helmholtz_2d(), **kw)
    ladder = {
        # round-2 bisection: which chunk construct crashes the fusion pass?
        "chunk_annulus": lambda: compile_chunk(
            build(problems.annulus_laplace()), 2),
        "chunk_hh_nod": lambda: compile_chunk(hh(), 4, density=False),
        # bare scan: grad+adam only (no resample/density/plateau branches)
        "chunk_hh_bare": lambda: compile_chunk(
            hh(), 4, density=False, resample=False, plateau=False),
        "chunk_hh_nores": lambda: compile_chunk(
            hh(), 4, density=False, resample=False),
        "chunk_hh_nopl": lambda: compile_chunk(
            hh(), 4, density=False, plateau=False),
        "chunk_p2d_bare": lambda: compile_chunk(
            build(problems.poisson_2d()), 4,
            density=False, resample=False, plateau=False),
        # compiler-option escape hatches: disable the crashing fusion pass
        # remotely (SIGILL stack: xla::jellyfish MainFusionOptimize /
        # round-1 note: TpuPriorityFusionQueue)
        "p2d_nofusion": lambda: compile_chunk(
            build(problems.poisson_2d()), 4,
            options={"xla_disable_hlo_passes": "priority-fusion,fusion"}),
        "p2d_nolatefusion": lambda: compile_chunk(
            build(problems.poisson_2d()), 4,
            options={"xla_tpu_use_fuel_estimates_for_fusion": "false"}),
        # structural discrimination vs the annulus (which compiles):
        # feature map (periodic vs minmax-only) and BC-group count
        "ann_minmax": lambda: compile_chunk(
            build(_replace_spec(problems.annulus_laplace(),
                                feature_kinds=(net.MINMAX, net.MINMAX))), 2),
        "p2d_2bc": lambda: compile_chunk(
            build(_replace_spec(problems.poisson_2d(),
                                bc_groups=problems.poisson_2d()
                                .bc_groups[:2])), 2),
        "p2d_remat": lambda: compile_chunk(
            _with_remat(build(problems.poisson_2d())), 4),
        "p2d_scan_min": lambda: compile_scan_variant(
            build(problems.poisson_2d())),
        # feature-width hypothesis: ann_minmax (2 cols) crashes while the
        # annulus minmax+periodic (3 cols) compiles — is 3 columns enough?
        # THE candidate fix: pad the feature embedding to 3 columns
        # (duplicate of column 0 — model class unchanged)
        "p2d_pad3": lambda: compile_chunk(
            build(problems.poisson_2d(), pad=3), 4),
        "hh_pad3": lambda: compile_chunk(
            build(problems.helmholtz_2d(), pad=3), 4),
        "p2d_periodic": lambda: compile_chunk(
            build(_replace_spec(problems.poisson_2d(),
                                feature_kinds=(net.MINMAX, net.PERIODIC))),
            4),
        "p2d_identity": lambda: compile_chunk(
            build(_replace_spec(problems.poisson_2d(),
                                feature_kinds=(net.IDENTITY, net.IDENTITY))),
            4),
        "hh_periodic": lambda: compile_chunk(
            build(_replace_spec(problems.helmholtz_2d(),
                                feature_kinds=(net.MINMAX, net.PERIODIC))),
            4),
        "p2d_scan_noaux": lambda: compile_scan_variant(
            build(problems.poisson_2d()), aux=False),
        "p2d_scan_sgd": lambda: compile_scan_variant(
            build(problems.poisson_2d()), optimizer="sgd"),
        "ann_4bc": lambda: compile_chunk(
            build(_replace_spec(problems.annulus_laplace(),
                                bc_groups=problems.annulus_laplace()
                                .bc_groups * 2)), 4),
        # control: the annulus pieces all compile+run in production
        "grad_annulus": lambda: compile_grad(build(problems.annulus_laplace())),
        # helmholtz ladder, smallest graph first
        "loss_hh": lambda: compile_loss(hh()),
        "grad_hh": lambda: compile_grad(hh()),
        "sampler_hh": lambda: compile_sampler(hh()),
        "density_hh": lambda: compile_density(hh()),
        "chunk_hh": lambda: compile_chunk(hh(), 4),
        # the real campaign shapes (20000/2000/8000/500, grid 111)
        "chunk_hh_big": lambda: compile_chunk(
            hh(n_col=20000, n_band=2000, n_adaptive=8000, n_bd=500,
               grid=111, depth=4, width=64), 4),
        # other square-domain presets
        "chunk_poisson2d": lambda: compile_chunk(
            build(problems.poisson_2d()), 4),
        "chunk_heat2d": lambda: compile_chunk(build(problems.heat_2d()), 4),
        # low-k helmholtz: is it the constant/frequency?
        "chunk_hh_k2": lambda: compile_chunk(
            build(problems.helmholtz_2d(k=2.0)), 4),
    }
    for name, thunk in ladder.items():
        if only and name != only:
            continue
        probe(name, thunk)


if __name__ == "__main__":
    main()
