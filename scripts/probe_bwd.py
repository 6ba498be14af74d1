"""Bisect the remote Mosaic rejection of the backward Taylor-2 kernel.

Round-2 state: the fused forward kernel (tpinn/kernels/mlp_taylor.py)
compiles and runs on the tunneled v5e, but the custom_vjp BACKWARD kernel
(tpinn/kernels/taylor_vjp.py) is rejected by the remote Mosaic compile
helper with exit 1 and no diagnostics.  This ladder AOT-compiles
progressively larger slices of the backward kernel body so one pass
isolates the offending construct (the same method scripts/probe_sigill.py
used on the XLA fusion SIGILL).

    python scripts/probe_bwd.py            # run the full ladder (subprocesses)
    python scripts/probe_bwd.py <probe>    # compile ONE probe in-process

Probe axes: body level (fwd-only .. full reverse sweep) x shape
(block/width/depth) — a level that fails at block 512 but passes at 128
points at VMEM pressure rather than an unsupported op.
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LEVELS = ("fwd", "stacks", "pick", "lastgrad", "revfirst", "revpairs", "full")


def build_probe(level: str, block: int, width: int, depth: int):
    """Compile one reduced backward kernel on the attached device."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )

    from tpinn import problems
    from tpinn.core import net, pde
    from tpinn.core.taylor import plan_streams
    from tpinn.kernels.mlp_taylor import _act, _feature_streams_kernel, dot_f32
    from tpinn.kernels.taylor_vjp import _act3

    problem = problems.annulus_laplace()
    compiled = pde.compile_pde(problem.equation, problem.coords)
    fm = net.feature_map_for(problem.feature_kinds)
    spec = net.MLPSpec(depth=depth, width=width)
    params = net.init_params(jax.random.PRNGKey(0), spec, fm, jnp.float32)
    layers = params["layers"]
    lb = tuple(float(v) for v in problem.lb)
    ub = tuple(float(v) for v in problem.ub)
    streams = plan_streams(compiled.indices)
    pos = {st: k for k, st in enumerate(streams)}
    S = len(streams)
    firsts = [st for st in streams if len(st) == 1]
    pairs = [st for st in streams if len(st) == 2]
    n_layers = len(layers)
    kinds = fm.kinds

    def kernel(z_ref, ct_ref, *refs):
        w_refs = refs[: 2 * n_layers]
        out_refs = refs[2 * n_layers:]
        i_blk = pl.program_id(0)
        z = z_ref[:]
        B = z.shape[0]
        dtype = z.dtype
        dot = lambda a, b: dot_f32(a, b).astype(dtype)
        row = lambda M, k: M[k * B:(k + 1) * B]

        def accum(ref, val):
            @pl.when(i_blk == 0)
            def _():
                ref[:] = val

            @pl.when(i_blk > 0)
            def _():
                ref[:] = ref[:] + val

        # ---- forward recompute
        hs = _feature_streams_kernel(z, kinds, lb, ub, streams, 0)
        H = jnp.concatenate(hs, axis=0)
        Hs, Xs, x0s = [], [], []
        for li in range(n_layers):
            w = w_refs[2 * li][:]
            b = w_refs[2 * li + 1][:]
            Hs.append(H)
            X = dot(H, w)
            if li == 0:
                X = X * spec.scl
            if li == n_layers - 1:
                Xs.append(X)
                x0s.append(None)
                break
            x0 = X[0:B] + b
            Xs.append(X)
            x0s.append(x0)
            name = spec.act_first if li == 0 else spec.act_hidden
            a, d1, d2 = _act(name, x0)
            new = [a]
            for st in streams[1:]:
                if len(st) == 1:
                    new.append(d1 * row(X, pos[st]))
                else:
                    i, j = st
                    new.append(d2 * row(X, pos[(i,)]) * row(X, pos[(j,)])
                               + d1 * row(X, pos[st]))
            H = jnp.concatenate(new, axis=0)

        if level == "fwd":
            # forward only; dummy writes so outputs aren't dead
            for li in range(n_layers):
                accum(out_refs[2 * li], jnp.zeros_like(out_refs[2 * li]))
                accum(out_refs[2 * li + 1],
                      jnp.zeros_like(out_refs[2 * li + 1]))
            return
        if level == "stacks":
            # consume every stacked value through the grad outputs
            for li in range(n_layers):
                v = jnp.sum(Xs[li]) + jnp.sum(Hs[li])
                accum(out_refs[2 * li],
                      jnp.zeros_like(out_refs[2 * li]) + v)
                accum(out_refs[2 * li + 1],
                      jnp.zeros_like(out_refs[2 * li + 1]) + v)
            return

        # ---- one-hot stream-major restack of the cotangent
        g = ct_ref[:] * spec.epsil
        eye_s = jnp.eye(S, dtype=g.dtype)
        pick = lambda k: jnp.dot(g, eye_s[:, k:k + 1],
                                 preferred_element_type=g.dtype)
        dX = jnp.concatenate([pick(k) for k in range(S)], axis=0)

        if level == "pick":
            for li in range(n_layers):
                v = jnp.sum(dX)
                accum(out_refs[2 * li],
                      jnp.zeros_like(out_refs[2 * li]) + v)
                accum(out_refs[2 * li + 1],
                      jnp.zeros_like(out_refs[2 * li + 1]) + v)
            return

        # ---- last layer grads
        li = n_layers - 1
        scl_here = spec.scl if li == 0 else 1.0
        db = jnp.sum(dX[0:B], axis=0, keepdims=True)
        dXraw = dX * scl_here
        accum(out_refs[2 * li], dot(Hs[li].T, dXraw))
        accum(out_refs[2 * li + 1], db)
        dH = dot(dXraw, w_refs[2 * li][:].T) if n_layers > 1 else None

        if level == "lastgrad":
            for li2 in range(n_layers - 1):
                v = jnp.sum(dH) if dH is not None else 0.0
                accum(out_refs[2 * li2],
                      jnp.zeros_like(out_refs[2 * li2]) + v)
                accum(out_refs[2 * li2 + 1],
                      jnp.zeros_like(out_refs[2 * li2 + 1]) + v)
            return

        # ---- reverse sweep
        for li in range(n_layers - 2, -1, -1):
            X, x0, Hin = Xs[li], x0s[li], Hs[li]
            name = spec.act_first if li == 0 else spec.act_hidden
            a, d1, d2 = _act(name, x0)
            d3 = _act3(name, x0, a, d1)
            ct = [row(dH, k) for k in range(S)]

            dx0 = ct[0] * d1
            dX_parts = [None] * S
            for st in firsts:
                dx0 = dx0 + ct[pos[st]] * d2 * row(X, pos[st])
                dX_parts[pos[st]] = ct[pos[st]] * d1
            if level != "revfirst":
                for st in pairs:
                    i, j = st
                    c = ct[pos[st]]
                    Xi, Xj = row(X, pos[(i,)]), row(X, pos[(j,)])
                    dx0 = dx0 + c * (d3 * Xi * Xj + d2 * row(X, pos[st]))
                    dX_parts[pos[(i,)]] = dX_parts[pos[(i,)]] + c * d2 * Xj
                    dX_parts[pos[(j,)]] = dX_parts[pos[(j,)]] + c * d2 * Xi
                    dX_parts[pos[st]] = c * d1
            else:
                for st in pairs:
                    dX_parts[pos[st]] = ct[pos[st]] * d1
            dX_parts[0] = dx0

            db = jnp.sum(dx0, axis=0, keepdims=True)
            scl_here = spec.scl if li == 0 else 1.0
            dXraw = jnp.concatenate(dX_parts, axis=0) * scl_here
            accum(out_refs[2 * li], dot(Hin.T, dXraw))
            accum(out_refs[2 * li + 1], db)
            if li > 0:
                dH = dot(dXraw, w_refs[2 * li][:].T)

    # ---- assemble the pallas_call exactly like taylor2_backward_pallas
    N = 2 * block
    z = jnp.full((N, 2), 0.5, jnp.float32)
    ct = jnp.ones((N, S), jnp.float32)
    n_blocks = pl.cdiv(N, block)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((block, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    weight_args = []
    out_shapes, out_specs = [], []
    for layer in layers:
        for arr in (layer["w"], layer["b"].reshape(1, -1)):
            weight_args.append(arr)
            in_specs.append(const(arr.shape))
            out_shapes.append(jax.ShapeDtypeStruct(arr.shape, arr.dtype))
            out_specs.append(const(arr.shape))

    fn = jax.jit(lambda zz, cc, *ws: pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
    )(zz, cc, *ws))
    t0 = time.perf_counter()
    fn.lower(z, ct, *weight_args).compile()
    return time.perf_counter() - t0


PROBES = {}
for lv in LEVELS:
    PROBES[f"{lv}_b512_w60_d6"] = (lv, 512, 60, 6)
# shape axis on the full kernel: VMEM-pressure vs op-support discrimination
PROBES["full_b128_w60_d6"] = ("full", 128, 60, 6)
PROBES["full_b512_w32_d2"] = ("full", 512, 32, 2)
PROBES["full_b256_w60_d6"] = ("full", 256, 60, 6)


def main():
    if len(sys.argv) > 1 and sys.argv[1] in PROBES:
        lv, blk, w, d = PROBES[sys.argv[1]]
        dt = build_probe(lv, blk, w, d)
        print(f"PROBE {sys.argv[1]}: OK ({dt:.1f}s)")
        return
    results = {}
    for name in PROBES:
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, __file__, name],
            capture_output=True, text=True, timeout=1200,
        )
        dt = time.perf_counter() - t0
        ok = r.returncode == 0 and "OK" in r.stdout
        tail = (r.stdout + r.stderr).strip().splitlines()
        results[name] = "OK" if ok else "FAIL"
        print(f"{name:24s} {'OK  ' if ok else 'FAIL'} {dt:7.1f}s  "
              f"{tail[-1][:110] if tail and not ok else ''}", flush=True)
    print(results)


if __name__ == "__main__":
    main()
