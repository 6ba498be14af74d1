"""Pallas kernel: fused MLP value + first/second derivative evaluation.

One kernel evaluates, for a block of collocation points, the full Taylor-2
stream set (u, u_i, u_ij — the ingredients of any second-order PDE
residual) through the whole dense chain without touching HBM between
layers:

    HBM traffic = points in + weight set in (tiny, once per block) +
                  stream columns out.

Everything else — the per-layer matmul of the stacked stream block
[S·B, W] @ [W, W] (MXU), the activation-derivative elementwise algebra
(VPU) — happens in VMEM.  This implements exactly the recurrence of
tpinn.core.taylor (same math, same stream plan), so the pure-JAX path is
the correctness oracle; tests compare them in interpreter mode.

Scope: inference-side residual evaluation (adaptive-density refresh,
artifact field evaluation, serving) — the places that run outside
jax.grad.  The training step keeps the XLA-fused pure-JAX path, which
jax.grad can differentiate.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpinn.core import net as net_mod
from tpinn.core.net import FeatureMap, MLPSpec
from tpinn.core.taylor import plan_streams

Array = jax.Array

DEFAULT_BLOCK = 512


def _feature_streams_kernel(z, kinds, lb, ub, streams, pad_to=0):
    """Feature stream construction inside the kernel (same rules as
    taylor.feature_streams, written on [B, d] VMEM values; pad_to
    duplicates column 0 incl. its derivative streams)."""
    B = z.shape[0]
    dtype = z.dtype
    zero = jnp.zeros((B, 1), dtype)
    per_stream = [[] for _ in streams]
    for ci, kind in enumerate(kinds):
        x = z[:, ci : ci + 1]
        if kind == net_mod.PERIODIC:
            c, s = jnp.cos(x), jnp.sin(x)
            for si, st in enumerate(streams):
                if st == ():
                    per_stream[si] += [c, s]
                elif st == (ci,):
                    per_stream[si] += [-s, c]
                elif st == (ci, ci):
                    per_stream[si] += [-c, -s]
                else:
                    per_stream[si] += [zero, zero]
        else:
            if kind == net_mod.MINMAX:
                scale = 2.0 / (ub[ci] - lb[ci])
                val = scale * (x - lb[ci]) - 1.0
                d1 = jnp.full((B, 1), scale, dtype)
            else:  # identity
                val = x
                d1 = jnp.ones((B, 1), dtype)
            for si, st in enumerate(streams):
                if st == ():
                    per_stream[si].append(val)
                elif st == (ci,):
                    per_stream[si].append(d1)
                else:
                    per_stream[si].append(zero)
    for cols in per_stream:
        while len(cols) < pad_to:
            cols.append(cols[0])
    return [jnp.concatenate(cols, axis=1) for cols in per_stream]


def dot_f32(a, b):
    """~f32-precision matmul from three bf16 MXU passes (hi/lo split).

    Mosaic rejects ``precision=HIGHEST`` dots here (unsupported shape cast
    in infer-vector-layout), and single-pass bf16 is too coarse for the
    second-derivative streams (measured 3.3e-3 abs error on real v5e);
    the classic split a = hi(a) + lo(a) recovers ~2^-21 relative error
    with plain bf16 dots: a·b ≈ ah·bh + ah·bl + al·bh."""
    f32 = jnp.float32
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(f32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(f32)).astype(jnp.bfloat16)
    p = lambda x, y: jnp.dot(x, y, preferred_element_type=f32)
    return p(ah, bh) + p(ah, bl) + p(al, bh)


def _act(name, x):
    if name == "tanh":
        a = jnp.tanh(x)
        d1 = 1.0 - a * a
        return a, d1, -2.0 * a * d1
    a = jnp.sin(x)
    return a, jnp.cos(x), -a


def _make_kernel(spec: MLPSpec, kinds, lb, ub, streams, n_layers,
                 pad_to=0):
    pos = {st: k for k, st in enumerate(streams)}
    S = len(streams)

    def kernel(z_ref, *refs):
        w_refs = refs[: 2 * n_layers]
        out_ref = refs[2 * n_layers]
        z = z_ref[:]
        B = z.shape[0]
        hs = _feature_streams_kernel(z, kinds, lb, ub, streams, pad_to)
        H = jnp.concatenate(hs, axis=0)  # [S*B, nf]

        for li in range(n_layers):
            w = w_refs[2 * li][:]
            b = w_refs[2 * li + 1][:]
            X = dot_f32(H, w).astype(z.dtype)
            if li == 0:
                X = X * spec.scl
            if li == n_layers - 1:
                # linear output; bias only on the primal stream
                outs = [X[0:B] + b] + [
                    X[k * B : (k + 1) * B] for k in range(1, S)
                ]
                break
            x0 = X[0:B] + b
            name = spec.act_first if li == 0 else spec.act_hidden
            a, d1, d2 = _act(name, x0)
            new = [a]
            for st in streams[1:]:
                Xs = X[pos[st] * B : (pos[st] + 1) * B]
                if len(st) == 1:
                    new.append(d1 * Xs)
                else:
                    i, j = st
                    Xi = X[pos[(i,)] * B : (pos[(i,)] + 1) * B]
                    Xj = X[pos[(j,)] * B : (pos[(j,)] + 1) * B]
                    new.append(d2 * Xi * Xj + d1 * Xs)
            H = jnp.concatenate(new, axis=0)

        # out: [B, S] column per stream, scaled by the output amplitude
        out_ref[:] = jnp.concatenate(outs, axis=1) * spec.epsil

    return kernel


def taylor2_streams_pallas(
    params: dict,
    z: Array,
    spec: MLPSpec,
    fm: FeatureMap,
    lb,
    ub,
    streams,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> Array:
    """Raw fused forward: [N, S] stream columns (order = ``streams``)."""
    if spec.fourier_features or spec.modified:
        raise ValueError("pallas kernel supports the plain dense family")
    if spec.out_dim != 1:
        raise ValueError("pallas kernel assumes scalar output")
    S = len(streams)
    layers = params["layers"]
    n_layers = len(layers)
    # host-side conversion: np, not jnp — inside a jit trace, unstacking a
    # jnp closure array yields tracers and float() would fail
    import numpy as _np

    lb = tuple(float(v) for v in _np.asarray(lb))
    ub = tuple(float(v) for v in _np.asarray(ub))

    N, d = z.shape
    n_blocks = pl.cdiv(N, block)
    N_pad = n_blocks * block
    if N_pad != N:
        z = jnp.pad(z, ((0, N_pad - N), (0, 0)), constant_values=0.5)

    kernel = _make_kernel(spec, fm.kinds, lb, ub, streams, n_layers,
                          getattr(fm, 'pad_to', 0))

    weight_args = []
    in_specs = [
        pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for layer in layers:
        # biases as [1, W]: TPU tiling wants >=2-D operands
        for arr in (layer["w"], layer["b"].reshape(1, -1)):
            weight_args.append(arr)
            in_specs.append(
                pl.BlockSpec(
                    arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM,
                )
            )

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_pad, S), z.dtype),
        interpret=interpret,
    )(z, *weight_args)

    return out[:N]


def taylor2_mlp_pallas(
    params: dict,
    z: Array,
    spec: MLPSpec,
    fm: FeatureMap,
    lb,
    ub,
    indices,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """Evaluate {multi-index: [N, 1]} u-derivative columns with the fused
    Pallas kernel.  Output layout matches tpinn.core.taylor.taylor2_mlp
    (out_dim must be 1)."""
    streams = plan_streams(indices)
    out = taylor2_streams_pallas(
        params, z, spec, fm, lb, ub, streams, block, interpret
    )
    return {st: out[:, k : k + 1] for k, st in enumerate(streams)}


def residual_kernel_fn(
    predictor, compiled, interpret: bool = False
) -> Callable:
    """Build ``f(params, z) -> residual`` that computes the u-partials with
    the Pallas kernel and evaluates the compiled PDE expression on them.
    Falls back is the caller's job (use hasattr(predictor,'tpinn_spec'))."""
    spec = predictor.tpinn_spec
    fm = predictor.tpinn_feature_map
    lb, ub = predictor.tpinn_bounds

    def fn(params, z):
        parts = taylor2_mlp_pallas(
            params, z, spec, fm, lb, ub, compiled.indices, interpret=interpret
        )
        return compiled.evaluate(z, parts)

    return fn
