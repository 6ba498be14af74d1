"""Reference-semantics mode: the reference solver's algorithmic cost model.

The reference cannot run in this image (its deps tensorflow-probability and
pyDOE are absent), so the CPU baseline that BASELINE.md requires is measured
from this faithful reimplementation of the reference's *hot path semantics*
(written from SURVEY.md, not copied):

- float64 everywhere (jax_enable_x64, software.py:18),
- batched Jacobians via reverse-mode vjp with one-hot cotangents, nested
  twice for second derivatives (vectgrad, software.py:246-279),
- the hardcoded polar-Laplace residual assembled from three vectgrad calls
  (gov_eqn, software.py:283-297),
- per-BC-group MSE + weighted residual MSE normalized by the initial loss
  (software.py:310-383),
- one optax.adam step per iteration under jit (software.py:387-393).

This is also the parity oracle: the forward-mode engine must agree with it
numerically (tests/test_pde.py, tests/test_parity.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from tpinn.core.deriv import vect_grad_reverse

Array = jax.Array


def reference_residual_polar(f_u: Callable[[Array], Array], z: Array) -> Array:
    """gov_eqn equivalent: f = u_rr + (1/r)·u_r + (1/r²)·u_θθ via
    reverse-over-reverse AD (software.py:283-297)."""
    u_g, _ = vect_grad_reverse(f_u, z)
    u_r = u_g[:, 0:1]
    fu_r = lambda zz: vect_grad_reverse(f_u, zz)[0][:, 0:1]
    fu_t = lambda zz: vect_grad_reverse(f_u, zz)[0][:, 1:2]
    u_rr = vect_grad_reverse(fu_r, z)[0][:, 0:1]
    u_tt = vect_grad_reverse(fu_t, z)[0][:, 1:2]
    r = z[:, 0:1]
    return u_rr + 1.0 / r * u_r + 1.0 / (r**2) * u_tt


def make_reference_loss(predictor: Callable[[dict, Array], Array]):
    """Reference-shaped loss on the polar-Laplace problem."""

    def loss_fn(params, data, lw, ref):
        f_u = lambda z: predictor(params, z)
        data_errs = []
        for z_bd, u_bd in zip(data["x_bd"], data["u_bd"]):
            diff = f_u(z_bd) - u_bd
            data_errs.append(jnp.mean(jnp.square(diff), axis=0))
        data_err = jnp.concatenate(data_errs)
        f = reference_residual_polar(f_u, data["x_col"])
        eqn_err = jnp.mean(jnp.square(f), axis=0)
        loss_data = jnp.sum(data_err)
        loss_eqn = jnp.sum(eqn_err)
        loss = loss_data + lw[0] * loss_eqn
        loss_info = jnp.concatenate(
            [jnp.stack([loss, loss_data, loss_eqn]), data_err, eqn_err]
        )
        return loss / ref, loss_info

    return loss_fn


def make_reference_adam_step(loss_fn, lr=1e-3):
    """One jitted Adam step, exactly the reference's adam_minimizer shape
    (software.py:387-393)."""
    opt = optax.adam(learning_rate=lr)

    @jax.jit
    def step(params, opt_state, data, lw, ref):
        grads, loss_info = jax.grad(loss_fn, has_aux=True)(params, data, lw, ref)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_info

    return opt, step
