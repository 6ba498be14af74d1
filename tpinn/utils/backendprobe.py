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
            "x = jnp.ones((128, 128)); print('ok', float((x @ x).sum()))")


def probe_backend(timeout: float = 300.0, platform: str | None = None) -> bool:
    """True iff a fresh process can initialize the (default or given)
    backend and execute one op within ``timeout`` seconds."""
    env = dict(os.environ)
    if platform:
        env["JAX_PLATFORMS"] = platform
    try:
        probe = subprocess.run(
            [sys.executable, "-c", _SNIPPET],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
        return "ok" in probe.stdout
    except subprocess.TimeoutExpired:
        return False
