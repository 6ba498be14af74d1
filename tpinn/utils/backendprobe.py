"""Accelerator backend liveness probe.

A wedged tunnel worker (observed round 3: a >60s dispatch killed
server-side left the backend UNAVAILABLE with clients blocking forever in
init) must produce a bounded, honest failure — never a hang.  The probe
runs in a SUBPROCESS so a hung backend init cannot block the caller, and
inherits the caller's environment (optionally overriding JAX_PLATFORMS so
it certifies the same backend the caller will use).
"""

from __future__ import annotations

import os
import subprocess
import sys

_SNIPPET = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((128, 128)); v = float((x @ x).sum());"
            "print('backend', jax.default_backend());"
            "print('ok', v)")


def probe_backend(
    timeout: float = 300.0,
    platform: str | None = None,
    require: str | None = None,
) -> bool:
    """True iff a fresh process can initialize the (default or given)
    backend and execute one op within ``timeout`` seconds.

    ``require`` additionally asserts which backend actually served the op
    (``jax.default_backend()``), so a silent CPU fallback cannot pass for
    a healthy accelerator — queue scripts and accuracy.py share this one
    health definition (advisor r4 finding #3)."""
    env = dict(os.environ)
    if platform:
        env["JAX_PLATFORMS"] = platform
    try:
        probe = subprocess.run(
            [sys.executable, "-c", _SNIPPET],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
        if "ok" not in probe.stdout:
            return False
        if require is not None and f"backend {require}" not in probe.stdout:
            return False
        return True
    except subprocess.TimeoutExpired:
        return False
