"""tpinn.core — pure-JAX solver library (no UI dependencies)."""

from tpinn.core import deriv, net, pde, sample, loss, optim  # noqa: F401
