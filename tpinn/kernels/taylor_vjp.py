"""Differentiable fused Taylor-2 residual kernel: closed-form custom_vjp.

The forward pass is the Pallas kernel of tpinn.kernels.mlp_taylor (all
value+derivative streams through the dense chain in VMEM).  This module
adds the matching BACKWARD pass — also a Pallas kernel — so the fused
engine can sit on the *training* path: ``jax.grad`` of a loss built on
these partials flows through the closed-form layer-reverse sweep instead of
XLA's autodiff of the restacked pure-JAX formulation.

Backward math (per hidden layer; φ', φ'', φ''' at the pre-activation x0):

    forward:  X = (H @ W)·scl₀,  x0 = X⁽⁾ + b
              H'⁽⁾    = φ(x0)
              H'⁽ᵏ⁾   = φ'·X⁽ᵏ⁾
              H'⁽ⁱʲ⁾  = φ''·X⁽ⁱ⁾·X⁽ʲ⁾ + φ'·X⁽ⁱʲ⁾
    reverse:  given ct = ∂L/∂H' per stream,
              ∂L/∂X⁽ⁱʲ⁾ = φ'·ct⁽ⁱʲ⁾
              ∂L/∂X⁽ᵏ⁾  = φ'·ct⁽ᵏ⁾ + Σ_{(i,j)∋k} φ''·X⁽other⁾·ct⁽ⁱʲ⁾
              ∂L/∂x0    = φ'·ct⁽⁾ + Σ_k φ''·X⁽ᵏ⁾·ct⁽ᵏ⁾
                          + Σ_{ij} (φ'''·X⁽ⁱ⁾·X⁽ʲ⁾ + φ''·X⁽ⁱʲ⁾)·ct⁽ⁱʲ⁾
              ∂L/∂b = Σ_B ∂L/∂x0,   ∂L/∂W = Hᵀ·(∂L/∂X·scl₀),
              ∂L/∂H = (∂L/∂X·scl₀)·Wᵀ

The kernel recomputes the forward (keeping per-layer H and x0 stacks in
VMEM — cheaper than spilling them to HBM between two passes) and then runs
the reverse sweep, accumulating ∂W/∂b across grid blocks in revisited
output blocks.

Third activation derivatives:  tanh: (6a²−2)·(1−a²);  sin: −cos.

Cotangents w.r.t. the input points are NOT produced (returned as zeros):
the training loss differentiates w.r.t. parameters only.  Residual-gradient
regularization (TrainSpec.deriv_loss) differentiates the residual w.r.t. z
in forward mode, which custom_vjp cannot serve — the loss builder must not
select this engine in that case (tpinn.core.loss enforces it).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpinn.core.net import FeatureMap, MLPSpec
from tpinn.core.taylor import plan_streams
from tpinn.kernels.mlp_taylor import (
    DEFAULT_BLOCK,
    _act,
    _feature_streams_kernel,
    taylor2_streams_pallas,
)

Array = jax.Array


def _act3(name: str, x0: Array, a: Array, d1: Array) -> Array:
    """Third derivative of the activation."""
    if name == "tanh":
        return (6.0 * a * a - 2.0) * d1
    return -jnp.cos(x0)  # sin


def _make_bwd_kernel(spec: MLPSpec, kinds, lb, ub, streams, n_layers,
                     pad_to=0):
    pos = {st: k for k, st in enumerate(streams)}
    S = len(streams)
    firsts = [st for st in streams if len(st) == 1]
    pairs = [st for st in streams if len(st) == 2]

    def kernel(z_ref, ct_ref, *refs):
        w_refs = refs[: 2 * n_layers]
        out_refs = refs[2 * n_layers :]
        i_blk = pl.program_id(0)
        z = z_ref[:]
        B = z.shape[0]
        dtype = z.dtype
        from tpinn.kernels.mlp_taylor import dot_f32
        dot = lambda a, b: dot_f32(a, b).astype(dtype)
        row = lambda M, k: M[k * B : (k + 1) * B]

        # ---- forward recompute, stacks kept in VMEM
        hs = _feature_streams_kernel(z, kinds, lb, ub, streams, pad_to)
        H = jnp.concatenate(hs, axis=0)                  # [S*B, nf]
        Hs: List[Array] = []
        Xs: List[Array] = []
        x0s: List[Array] = []
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
                    new.append(
                        d2 * row(X, pos[(i,)]) * row(X, pos[(j,)])
                        + d1 * row(X, pos[st])
                    )
            H = jnp.concatenate(new, axis=0)

        def accum(ref, val):
            @pl.when(i_blk == 0)
            def _():
                ref[:] = val

            @pl.when(i_blk > 0)
            def _():
                ref[:] = ref[:] + val

        # ---- reverse sweep
        g = ct_ref[:] * spec.epsil                       # [B, S]
        # stream-major stacking [S*B, 1] to match the forward layout.
        # NOT g.T.reshape(S*B, 1) (Mosaic: unsupported shape cast) and NOT
        # a concat of column slices (Mosaic: concat operands carry distinct
        # lane offsets) — one-hot matmuls materialize each stream column at
        # lane offset 0, which concatenates fine.  These were the
        # custom_vjp kernel's compile blockers on real TPUs.
        eye_s = jnp.eye(S, dtype=g.dtype)
        pick = lambda k: jnp.dot(g, eye_s[:, k:k + 1],
                                 preferred_element_type=g.dtype)
        dX = jnp.concatenate([pick(k) for k in range(S)], axis=0)

        li = n_layers - 1
        scl_here = spec.scl if li == 0 else 1.0
        # bias adds AFTER the scl scaling: db sees the unscaled cotangent
        db = jnp.sum(dX[0:B], axis=0, keepdims=True)
        dXraw = dX * scl_here
        accum(out_refs[2 * li], dot(Hs[li].T, dXraw))
        accum(out_refs[2 * li + 1], db)
        if n_layers > 1:
            dH = dot(dXraw, w_refs[2 * li][:].T)

        for li in range(n_layers - 2, -1, -1):
            X, x0, Hin = Xs[li], x0s[li], Hs[li]
            name = spec.act_first if li == 0 else spec.act_hidden
            a, d1, d2 = _act(name, x0)
            d3 = _act3(name, x0, a, d1)
            ct = [row(dH, k) for k in range(S)]

            dx0 = ct[0] * d1
            dX_parts: List[Array] = [None] * S           # noqa: filled below
            for st in firsts:
                dx0 = dx0 + ct[pos[st]] * d2 * row(X, pos[st])
                dX_parts[pos[st]] = ct[pos[st]] * d1
            for st in pairs:
                i, j = st
                c = ct[pos[st]]
                Xi, Xj = row(X, pos[(i,)]), row(X, pos[(j,)])
                dx0 = dx0 + c * (d3 * Xi * Xj + d2 * row(X, pos[st]))
                # i == j hits the same slot twice -> 2·d2·X_i, as required
                dX_parts[pos[(i,)]] = dX_parts[pos[(i,)]] + c * d2 * Xj
                dX_parts[pos[(j,)]] = dX_parts[pos[(j,)]] + c * d2 * Xi
                dX_parts[pos[st]] = c * d1
            dX_parts[0] = dx0

            db = jnp.sum(dx0, axis=0, keepdims=True)
            scl_here = spec.scl if li == 0 else 1.0
            dXraw = jnp.concatenate(dX_parts, axis=0) * scl_here
            accum(out_refs[2 * li], dot(Hin.T, dXraw))
            accum(out_refs[2 * li + 1], db)
            if li > 0:
                dH = dot(dXraw, w_refs[2 * li][:].T)

    return kernel


def _bwd_block_limit(n_layers: int, width: int, S: int,
                     budget_bytes: int = 8 * 1024 * 1024) -> int:
    """Largest safe point-block for the backward kernel (multiple of 128).

    The reverse sweep holds the full forward stacks in VMEM (Hs + Xs:
    2·n_layers stream-stacked [S·B, W] f32 buffers) plus ~8 comparable
    temporaries (dX/dXraw/dH/dX_parts and the bf16 hi/lo matmul splits).
    Round-3 compile bisection on the real v5e (scripts/probe_bwd.py):
    the FULL kernel at width 60 × depth 6 is rejected at block 512 —
    "Internal: AOT", i.e. VMEM exhaustion with the diagnostic eaten by
    the tunnel — but compiles and runs at 256; every reduced body level
    (fwd/stacks/pick/lastgrad) passes at 512.  An 8 MB budget (half of
    VMEM, leaving room for Mosaic's own buffers) reproduces exactly that
    boundary: w60·d6 → 256, w32·d2 → ≥512."""
    bytes_per_point = (2 * n_layers + 8) * S * max(width, 1) * 4
    blk = (budget_bytes // bytes_per_point) // 128 * 128
    return max(128, int(blk))


def taylor2_backward_pallas(
    layers: Sequence[dict],
    z: Array,
    ct: Array,
    spec: MLPSpec,
    fm: FeatureMap,
    lb,
    ub,
    streams,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """∂L/∂layers given the cotangent ``ct`` [N, S] on the stream columns."""
    import numpy as _np

    lb = tuple(float(v) for v in _np.asarray(lb))
    ub = tuple(float(v) for v in _np.asarray(ub))
    n_layers = len(layers)
    S = len(streams)
    block = min(block, _bwd_block_limit(n_layers, spec.width, S))
    N, d = z.shape
    n_blocks = pl.cdiv(N, block)
    N_pad = n_blocks * block
    if N_pad != N:
        z = jnp.pad(z, ((0, N_pad - N), (0, 0)), constant_values=0.5)
        ct = jnp.pad(ct, ((0, N_pad - N), (0, 0)))  # zero ct: no gradient

    kernel = _make_bwd_kernel(spec, fm.kinds, lb, ub, streams, n_layers,
                              getattr(fm, 'pad_to', 0))

    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    weight_args = []
    for layer in layers:
        for arr in (layer["w"], layer["b"].reshape(1, -1)):
            weight_args.append(arr)
            in_specs.append(const(arr.shape))

    out_shapes = []
    out_specs = []
    for layer in layers:
        for arr in (layer["w"], layer["b"].reshape(1, -1)):
            out_shapes.append(jax.ShapeDtypeStruct(arr.shape, arr.dtype))
            out_specs.append(const(arr.shape))

    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(z, ct, *weight_args)

    grads = []
    for li in range(n_layers):
        grads.append({"w": outs[2 * li], "b": outs[2 * li + 1][0]})
    return grads


def make_kernel_partials(
    spec: MLPSpec,
    fm: FeatureMap,
    lb,
    ub,
    indices,
    block: int = DEFAULT_BLOCK,
    interpret: bool | None = None,
):
    """Build a differentiable ``partials(params, z, indices) -> dict`` whose
    forward AND backward are Pallas kernels (custom_vjp pair).

    Matches the tpinn_partials interface of tpinn.core.taylor, so it can be
    swapped in as the loss engine (tpinn.core.loss make_loss(engine=
    "kernel")).  Plain dense family, scalar output, order ≤ 2 only.

    ``interpret=None`` auto-selects: compiled Mosaic on TPU, interpreter on
    the CPU backend (tests, gated CPU fallbacks) where Mosaic can't lower.
    """
    if spec.fourier_features or spec.modified:
        raise ValueError("pallas kernel supports the plain dense family")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    streams = plan_streams(indices)

    @jax.custom_vjp
    def streams_fn(layers, z):
        return taylor2_streams_pallas(
            {"layers": list(layers)}, z, spec, fm, lb, ub, streams,
            block, interpret,
        )

    def fwd(layers, z):
        return streams_fn(layers, z), (layers, z)

    def bwd(res, ct):
        layers, z = res
        dlayers = taylor2_backward_pallas(
            layers, z, ct, spec, fm, lb, ub, streams, block, interpret
        )
        # z cotangent deliberately zero: parameters-only training path
        return dlayers, jnp.zeros_like(z)

    streams_fn.defvjp(fwd, bwd)

    def partials(params, z, indices_req):
        out = streams_fn(params["layers"], z)
        return {st: out[:, k : k + 1] for k, st in enumerate(streams)}

    return partials
