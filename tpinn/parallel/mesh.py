"""Device-mesh parallelism for PINN training.

The reference is strictly single-device (SURVEY §2 parallelism census: no
DP/TP/PP/SP/EP, no collectives of any kind).  The right scale axes for this
workload — and the ones implemented here — are:

- **points** (data parallelism): the loss is a mean over collocation /
  boundary points, so sharding the point batch across chips makes every
  per-point residual evaluation local; only the scalar loss terms and the
  parameter gradients cross the interconnect (one psum per step, inserted
  by XLA from sharding annotations, riding ICI within a slice).  Parameters
  (a few-KB MLP) are replicated.
- **ensemble** (a form of model parallelism that actually pays off at this
  model size): independent networks (different seeds / frequency scales /
  stages) trained simultaneously via vmap, sharded one-or-more per chip.
  Tensor/pipeline parallelism would be counterproductive for ~10-100KB
  parameter pytrees — each chip's MXU is already underutilized by a 50-wide
  layer; this is documented as a deliberate design position (SURVEY §5).

Everything uses `jax.sharding.Mesh` + NamedSharding annotations under
``jit`` — XLA chooses the collectives — with
``jax.lax.with_sharding_constraint`` pinning the point batches.  The same
code runs on 1 CPU device, a virtual 8-CPU mesh (tests), or a TPU slice.

**Multi-slice (DCN) position.**  Beyond one ICI-connected slice, the only
traffic this workload generates is the per-step gradient psum of a
10-100KB parameter pytree — orders of magnitude under DCN bandwidth — so
the right multi-slice strategy is plain points-DP *across* slices too:
``make_multislice_mesh`` extends the points axis over every slice, laying
devices out so points-axis neighbours are ICI-adjacent within a slice and
exactly one gradient all-reduce per step crosses DCN.  Under a
multi-controller launch each process calls ``jax.distributed.initialize()``
first and passes ``jax.devices()`` (global) here; all sharding annotations
downstream are unchanged because the axis names are the same.  No
tensor/pipeline sharding ever crosses DCN (nothing here would amortize it).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

POINTS_AXIS = "points"
ENSEMBLE_AXIS = "ensemble"


def make_mesh(
    devices: Optional[Sequence] = None,
    ensemble: int = 1,
) -> Mesh:
    """Build a (ensemble, points) mesh over the available devices.

    ``ensemble`` divides the device count; the remainder becomes the points
    (data-parallel) axis.  ``ensemble=1`` gives pure point-parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % ensemble != 0:
        raise ValueError(f"{n} devices not divisible by ensemble={ensemble}")
    arr = np.asarray(devices).reshape(ensemble, n // ensemble)
    return Mesh(arr, (ENSEMBLE_AXIS, POINTS_AXIS))


def make_multislice_mesh(
    devices: Optional[Sequence] = None,
    ensemble: int = 1,
    n_slices: Optional[int] = None,
) -> Mesh:
    """(ensemble, points) mesh spanning multiple ICI slices over DCN.

    Devices are grouped by ``slice_index`` (TPU runtime attribute; when
    absent — CPU test stand-ins — contiguous blocks of ``len/n_slices``
    emulate slices).  Within each ensemble row the points axis enumerates
    slice-0's chips, then slice-1's, …, so XLA's gradient all-reduce
    decomposes into in-slice ICI reduce-scatters plus one small cross-slice
    DCN exchange.  Run ``jax.distributed.initialize()`` per process first
    under a multi-controller launch.
    """
    devices = list(devices if devices is not None else jax.devices())
    slice_ids = [getattr(d, "slice_index", None) for d in devices]
    if any(s is None for s in slice_ids):
        if n_slices is None:
            n_slices = 1
        if len(devices) % n_slices:
            raise ValueError(f"{len(devices)} devices not divisible by "
                             f"n_slices={n_slices}")
        per = len(devices) // n_slices
        groups = [devices[i * per:(i + 1) * per] for i in range(n_slices)]
    else:
        order = sorted(set(slice_ids))
        groups = [[d for d, s in zip(devices, slice_ids) if s == sid]
                  for sid in order]
    per_slice = len(groups[0])
    if any(len(g) != per_slice for g in groups):
        raise ValueError("slices have unequal device counts")
    if per_slice % ensemble:
        raise ValueError(f"per-slice device count {per_slice} not divisible "
                         f"by ensemble={ensemble}")
    # [ensemble, points] with points = slice-major blocks of in-slice chips
    rows = []
    for e in range(ensemble):
        row = []
        chunk = per_slice // ensemble
        for g in groups:
            row.extend(g[e * chunk:(e + 1) * chunk])
        rows.append(row)
    return Mesh(np.asarray(rows, dtype=object), (ENSEMBLE_AXIS, POINTS_AXIS))


def points_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (point-batch) axis across the points axis."""
    return NamedSharding(mesh, P(POINTS_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _constrain_points(x: Array, mesh: Mesh) -> Array:
    return jax.lax.with_sharding_constraint(x, points_sharding(mesh))


def shard_data(data: Dict, mesh: Mesh) -> Dict:
    """Place a sampler output dict with point batches sharded over chips.

    BC groups keep whole-group locality only if n_bd divides the axis size;
    jax.device_put handles either way (uneven → XLA pads internally is NOT
    allowed, so counts must divide the points-axis size — the samplers take
    care of that via ``round_count``).
    """
    ps = points_sharding(mesh)
    out = dict(data)
    out["x_col"] = jax.device_put(data["x_col"], ps)
    out["x_bd"] = [jax.device_put(x, ps) for x in data["x_bd"]]
    out["u_bd"] = [jax.device_put(u, ps) for u in data["u_bd"]]
    return out


def round_count(n: int, mesh: Mesh) -> int:
    """Round a sample count up to a multiple of the points-axis size."""
    size = mesh.shape[POINTS_AXIS]
    return int(-(-n // size) * size)


def sharded_sampler(sample_fn: Callable, mesh: Mesh) -> Callable:
    """Wrap a sampler so freshly drawn batches carry point shardings even
    when generated *inside* a jitted scan (resampling never leaves the
    device mesh)."""

    def fn(key, F):
        data = sample_fn(key, F)
        data = dict(data)
        data["x_col"] = _constrain_points(data["x_col"], mesh)
        data["x_bd"] = [_constrain_points(x, mesh) for x in data["x_bd"]]
        data["u_bd"] = [_constrain_points(u, mesh) for u in data["u_bd"]]
        return data

    return fn


def make_parallel_loss(loss_fn: Callable, mesh: Mesh) -> Callable:
    """Annotate a loss so point batches stay sharded and params replicated.

    XLA turns the final means into a reduce over the points axis (psum on
    ICI) automatically; nothing else crosses chips.
    """

    def fn(params, data, lw, ref):
        data = dict(data)
        data["x_col"] = _constrain_points(data["x_col"], mesh)
        data["x_bd"] = [_constrain_points(x, mesh) for x in data["x_bd"]]
        data["u_bd"] = [_constrain_points(u, mesh) for u in data["u_bd"]]
        return loss_fn(params, data, lw, ref)

    return fn


# ---------------------------------------------------------------------------
# Ensemble parallelism: N independent nets, vmapped, sharded over chips
# ---------------------------------------------------------------------------


def ensemble_init(key: Array, init_fn: Callable, n: int, mesh: Optional[Mesh] = None):
    """Init ``n`` parameter pytrees stacked on a leading ensemble axis,
    sharded over the mesh's ensemble axis when given."""
    keys = jax.random.split(key, n)
    params = jax.vmap(init_fn)(keys)
    if mesh is not None:
        sh = NamedSharding(mesh, P(ENSEMBLE_AXIS))
        params = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), params)
    return params


def make_ensemble_loss(loss_fn: Callable, mesh: Optional[Mesh] = None) -> Callable:
    """vmap a loss over stacked ensemble params (shared data), returning the
    summed loss (so one backward pass trains all members) plus stacked
    per-member loss_info."""

    vloss = jax.vmap(loss_fn, in_axes=(0, None, None, None))

    def fn(params, data, lw, ref):
        loss_n, info = vloss(params, data, lw, ref)
        return jnp.sum(loss_n), info

    return fn
