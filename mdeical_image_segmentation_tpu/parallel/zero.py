"""ZeRO-1 optimizer-state sharding over the mesh's ``data`` axis (GSPMD).

The reference replicates the full Adam state on every GPU
(``nn.DataParallel`` keeps one optimizer on the source device and the
HF Trainer one per process; reference model/unet3d/trainer.py:23-25,
train.py:163-170).  On a TPU mesh the idiomatic upgrade is ZeRO stage 1:
keep parameters replicated (so the forward/backward is untouched) but
partition the optimizer moments across the data-parallel devices — each
device stores and updates only its ``1/N`` slice, and XLA all-gathers the
parameter *updates* (same byte volume as the ZeRO paper's gather) on the
way into ``optax.apply_updates``.  Memory per device drops by ~2/3 of the
optimizer footprint for Adam at world size ≥ 4 (Rajbhandari et al., "ZeRO:
Memory Optimizations Toward Training Trillion Parameter Models" — the
stage-1 partitioning, expressed here as sharding annotations instead of
hand-written gathers: pick a mesh, annotate, let GSPMD place collectives).

Composes with the channel tensor-parallelism in :mod:`parallel.tensor`:
a leaf already sharded over ``model`` gets its *data*-axis partition on a
different (largest remaining divisible) dimension, so a ``(data, model)``
mesh shards moments over both axes.

API (mirrors :mod:`parallel.tensor`):
- ``zero1_specs(opt_state, mesh, base_specs=None)`` → PartitionSpec pytree.
- ``shard_opt_state_zero1(opt_state, mesh, base_specs=None)`` → device_put
  the moments with those specs (params stay wherever they are).
- Trainer wiring: ``TrainingArguments(zero1=True)``; the jitted train step
  pins the output optimizer state to the same specs with a sharding
  constraint so buffer donation round-trips the layout.

Multi-host note: the msgpack checkpoint path gathers to host 0 and is
single-process only for ZeRO-sharded state; use the Orbax backend
(train/orbax_ckpt.py) for multi-host ZeRO runs, as for TP.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def _leaf_spec(x: Any, n: int, axis_name: str, base: Optional[P]) -> P:
    """Partition the largest not-yet-sharded dim divisible by ``n``.

    ``base`` is an existing spec (e.g. tensor-parallel out-channel
    sharding) to compose with; its entries are preserved.
    """
    shape = np.shape(x)
    ndim = len(shape)
    if ndim == 0:
        return base if base is not None else P()
    entries = list(base) if base is not None else []
    entries += [None] * (ndim - len(entries))
    best, best_extent = None, 0
    for i, extent in enumerate(shape):
        if entries[i] is None and extent % n == 0 and extent >= n:
            if extent > best_extent:
                best, best_extent = i, extent
    if best is not None:
        entries[best] = axis_name
    # canonical form (no trailing Nones) — what jax reports back from a
    # placed array, so spec == array.sharding.spec round-trips
    while entries and entries[-1] is None:
        entries.pop()
    return P(*entries)


def zero1_specs(
    opt_state,
    mesh: Mesh,
    base_specs=None,
    axis_name: str = DATA_AXIS,
):
    """PartitionSpec pytree sharding every moment leaf over ``axis_name``.

    Scalar leaves (step counts) and leaves with no dimension divisible by
    the axis size stay replicated (or keep their ``base_specs`` entry).
    """
    n = mesh.shape[axis_name]
    if base_specs is None:
        return jax.tree_util.tree_map(
            lambda x: _leaf_spec(x, n, axis_name, None), opt_state
        )
    return jax.tree_util.tree_map(
        lambda x, b: _leaf_spec(x, n, axis_name, b), opt_state, base_specs
    )


def shard_opt_state_zero1(
    opt_state,
    mesh: Mesh,
    base_specs=None,
    axis_name: str = DATA_AXIS,
):
    """Lay out an optax state pytree ZeRO-1-partitioned on ``mesh``."""
    specs = zero1_specs(opt_state, mesh, base_specs, axis_name)
    return (
        jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            opt_state,
            specs,
        ),
        specs,
    )
