"""Pallas kernel: fused Adam update on the flattened parameter vector.

One VMEM-resident kernel performs the whole optax-Adam recurrence —
moment updates, bias correction, parameter step — in a single pass over
the raveled parameter/moment vectors (3 reads + 3 writes of ~n floats,
zero intermediate HBM traffic).  For PINN-sized parameter vectors this is
bandwidth-trivial; it exists as the optimizer member of the native-kernel
tier (SURVEY §7 PR5) and as the update step for fully-fused serving-time
fine-tuning loops.

Matches optax.adam exactly (same bias-correction form:
``m̂ = m/(1-β1^t)``, ``v̂ = v/(1-β2^t)``, ``θ ← θ - lr·m̂/(√v̂+ε)``);
tests assert equality against optax.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BLOCK = 8 * 1024


def _adam_kernel(b1, b2, eps, g_ref, p_ref, m_ref, v_ref, lr_ref, t_ref,
                 p_out, m_out, v_out):
    g = g_ref[:]
    m = b1 * m_ref[:] + (1.0 - b1) * g
    v = b2 * v_ref[:] + (1.0 - b2) * g * g
    t = t_ref[0, 0]
    lr = lr_ref[0, 0]
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t
    m_hat = m / bc1
    v_hat = v / bc2
    p_out[:] = p_ref[:] - lr * m_hat / (jnp.sqrt(v_hat) + eps)
    m_out[:] = m
    v_out[:] = v


def adam_update_flat(
    grads: Array, params: Array, m: Array, v: Array, lr, step,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
    block: int = BLOCK, interpret: bool = False,
):
    """One fused Adam step on 1-D vectors.  ``step`` is 1-based (the count
    AFTER this update, as optax counts).  Returns (params, m, v)."""
    n = params.shape[0]
    n_blocks = pl.cdiv(n, block)
    n_pad = n_blocks * block
    dtype = params.dtype

    def pad(x):
        return jnp.pad(x, (0, n_pad - n)) if n_pad != n else x

    g_p, p_p, m_p, v_p = pad(grads), pad(params), pad(m), pad(v)
    lr_a = jnp.full((1, 1), lr, dtype)
    t_a = jnp.full((1, 1), step, dtype)

    vec = lambda: pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
    out_shapes = [jax.ShapeDtypeStruct((n_pad,), dtype)] * 3

    p_new, m_new, v_new = pl.pallas_call(
        partial(_adam_kernel, b1, b2, eps),
        grid=(n_blocks,),
        in_specs=[vec(), vec(), vec(), vec(), smem(), smem()],
        out_specs=[vec(), vec(), vec()],
        out_shape=out_shapes,
        interpret=interpret,
    )(g_p, p_p, m_p, v_p, lr_a, t_a)
    return p_new[:n], m_new[:n], v_new[:n]
