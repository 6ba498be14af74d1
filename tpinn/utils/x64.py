"""Serialized access to the process-global ``jax_enable_x64`` flag.

``jax.config.update("jax_enable_x64", ...)`` mutates global state; the app
runs trainings on background daemon threads (tpinn.app.controller), so two
concurrent jobs toggling the flag for their f64 host-evaluation sections
could interleave save/toggle/restore and leave the flag wrong mid-trace
(nondeterministic retraces, or f64 graphs shipped to a TPU runtime that
rejects them).  Every x64 toggle+restore section in tpinn goes through
``force_x64()`` so the critical sections serialize.  The sections are short
host-side evaluations (train.eval_stage_f64, polish.last_layer_lsq), so
the lock is not a throughput concern.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

import jax

_LOCK = threading.RLock()


@contextmanager
def force_x64():
    """Enable float64 for the duration of the block, restoring the prior
    value on exit; serialized against other force_x64 sections."""
    with _LOCK:
        was = bool(jax.config.jax_enable_x64)
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", was)
