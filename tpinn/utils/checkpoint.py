"""Checkpoint / resume for trained parameters and stage state.

The reference keeps trained params only in thread-local memory — once the
training thread dies the model is gone (SURVEY.md §5).  Here each stage's
parameter pytree (plus metadata) is saved as a flat .npz keyed by tree
paths, loadable without the original module state.  Orbax is available in
the environment for heavier use; this format stays dependency-free and
human-inspectable.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from tpinn.utils.artifacts import atomic_savez


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_pytree(path, tree, meta: Optional[Dict[str, Any]] = None) -> None:
    """Save a pytree of arrays as flat npz with path-string keys."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {f"leaf:{_path_str(p)}": np.asarray(v) for p, v in leaves_with_paths}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    atomic_savez(path, **arrays)


def load_pytree(path, like) -> Tuple[Any, Dict[str, Any]]:
    """Load into the structure of the template pytree ``like``."""
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
    paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, template in paths:
        key = f"leaf:{_path_str(p)}"
        if key not in data:
            raise KeyError(f"checkpoint {path} missing leaf {key}")
        leaves.append(jax.numpy.asarray(data[key], dtype=template.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


def save_phase_state(path, done: int, state, hist) -> None:
    """Mid-stage Adam checkpoint: the full scan carry (params, opt_state,
    data, density F, rng key, plateau ring) + steps done + history so far.
    Written atomically after a dispatched chunk (optim.make_adam_phase's
    ``ckpt_cb``), so a killed run resumes at chunk granularity with
    identical numerics."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {f"leaf:{_path_str(p)}": np.asarray(v)
              for p, v in leaves_with_paths}
    arrays["__hist__"] = np.asarray(hist)
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"done": int(done)}).encode(), dtype=np.uint8
    )
    atomic_savez(path, **arrays)


def load_phase_state(path, like_state) -> Tuple[int, Any, np.ndarray]:
    """Load a mid-stage checkpoint into the carry structure ``like_state``
    (build it exactly as the phase would at step 0).  Returns
    ``(done, state, hist)`` for ``make_adam_phase``'s ``init=``."""
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    paths, treedef = jax.tree_util.tree_flatten_with_path(like_state)
    leaves = []
    for p, template in paths:
        key = f"leaf:{_path_str(p)}"
        if key not in data:
            raise KeyError(f"phase checkpoint {path} missing leaf {key}")
        if data[key].shape != tuple(np.shape(template)):
            # e.g. sampler counts / batch sizes changed since the save: a
            # structurally-valid but wrong-shaped carry would otherwise
            # surface as an opaque XLA shape error inside the dispatched
            # chunk, outside the caller's restart-the-phase try/except
            raise ValueError(
                f"phase checkpoint {path} leaf {key} has shape "
                f"{data[key].shape}, expected {tuple(np.shape(template))} "
                f"(sampler/batch config changed since the save?)"
            )
        leaves.append(jax.numpy.asarray(data[key], dtype=template.dtype))
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return int(meta["done"]), state, data["__hist__"]
