"""Channel tensor-parallelism over the mesh's ``model`` axis (GSPMD).

The reference has no tensor parallelism (its only parallelism is
single-host ``nn.DataParallel``, reference model/unet3d/trainer.py:23-25);
this is the TPU-native extension the (data, model) mesh was laid out for:
shard every conv kernel's *output-channel* dimension (and the matching
per-channel bias/scale vectors) across ``model``-axis devices and let
GSPMD propagate.  XLA then keeps activations channel-sharded through
conv → bias → activation chains and inserts the collectives (all-gathers
where a layer genuinely needs full channels, e.g. GroupNorm group stats
that span shards, the channel concats, and the final 1-channel head) over
ICI — the scaling-book recipe: pick a mesh, annotate shardings, let the
compiler place collectives.

Use when one chip's HBM cannot hold the model+activations at the desired
width/resolution (wide UNets, 3D decoders): TP trades ICI traffic for
per-chip memory.  For throughput at reference widths, prefer the data
axis; both compose — the same annotated program runs on any (data, model)
mesh shape.

API:
- ``tp_param_specs(params, mesh)`` → PartitionSpec pytree (out-channel
  sharding wherever divisible, replicated otherwise).
- ``shard_params_tp(params, mesh)`` → device_put the params with those
  specs (entrypoint for inference or custom loops).
- Works with plain ``jax.jit``: pass sharded params in; XLA compiles the
  TP program.  Numeric parity with the replicated forward is tested on
  the 8-device CPU mesh (tests/test_tensor_parallel.py).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def _leaf_spec(x: Any, n_shards: int, axis_name: str) -> P:
    shape = np.shape(x)
    ndim = len(shape)
    # conv kernels (H, W, Cin, Cout) / (D, H, W, Cin, Cout), dense (Cin, Cout):
    # shard the trailing output-channel dim when it divides evenly.
    if ndim >= 2 and shape[-1] % n_shards == 0:
        return P(*([None] * (ndim - 1) + [axis_name]))
    # per-output-channel vectors (bias, norm scale/bias)
    if ndim == 1 and shape[0] % n_shards == 0 and shape[0] >= n_shards:
        return P(axis_name)
    return P()


def tp_param_specs(params, mesh: Mesh, axis_name: str = MODEL_AXIS):
    """PartitionSpec pytree sharding out-channels over ``axis_name``."""
    n = mesh.shape[axis_name]
    return jax.tree_util.tree_map(lambda x: _leaf_spec(x, n, axis_name), params)


def shard_params_tp(params, mesh: Mesh, axis_name: str = MODEL_AXIS):
    """Lay out a param pytree tensor-parallel on ``mesh``.

    Every leaf gets a :class:`NamedSharding` from :func:`tp_param_specs`;
    a following ``jax.jit`` of the forward/train step compiles the GSPMD
    tensor-parallel program from these input shardings alone.
    """
    specs = tp_param_specs(params, mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
