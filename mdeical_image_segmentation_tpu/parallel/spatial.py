"""Spatially-sharded volumetric inference and training with ICI halo exchange.

The reference handles inputs larger than memory purely by host-side patch
decomposition (SliceBuilder + halo mirror-pad + overlap averaging —
SURVEY.md §5 'long-context' analog).  This module adds the TPU-idiomatic
extension anticipated there: shard ONE volume's Y axis across the mesh's
data devices and run the forward in SPMD, exchanging conv-halo rows between
neighboring shards over ICI with ``jax.lax.ppermute`` — the segmentation
equivalent of sequence-parallel attention's ring exchange.

Semantics: each shard is processed like a sliding-window patch with a halo
of ``halo`` rows gathered from its neighbors (edge shards reflect-pad, like
``mirror_pad``).  With ``halo ≥`` the model's half receptive field the
result equals the monolithic forward exactly for normalization-free layer
orders; GroupNorm statistics are per-shard — the same per-patch semantics
the reference's patch-based inference already has.

Works on any mesh axis size (tested on the 8-device CPU mesh); on real
hardware the ppermute rides ICI neighbor links.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
try:
    from jax import shard_map as _shard_map_new  # jax ≥ 0.8

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep):
        # the replication check was renamed check_rep → check_vma in 0.8
        return _shard_map_new(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def _halo_exchange(x: jax.Array, halo: int, axis: int, axis_name: str) -> jax.Array:
    """Concatenate `halo` rows from the left/right mesh neighbors along
    `axis`.  Edge shards reflect-pad (mirror_pad parity at volume borders)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    def take(a, sl):
        slicer = [slice(None)] * a.ndim
        slicer[axis] = sl
        return a[tuple(slicer)]

    # my last `halo` rows go right; my first `halo` rows go left
    send_right = take(x, slice(-halo, None))
    send_left = take(x, slice(0, halo))
    right_perm = [(i, (i + 1) % n) for i in range(n)]
    left_perm = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(send_right, axis_name, right_perm)
    from_right = jax.lax.ppermute(send_left, axis_name, left_perm)

    # reflect-pad at the global volume edges (mirror of rows 1..halo)
    reflect_lo = jnp.flip(take(x, slice(1, halo + 1)), axis=axis)
    reflect_hi = jnp.flip(take(x, slice(-halo - 1, -1)), axis=axis)
    from_left = jnp.where(idx == 0, reflect_lo, from_left)
    from_right = jnp.where(idx == n - 1, reflect_hi, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=axis)


def spatial_sharded_apply(
    model,
    variables,
    volume: jax.Array,  # (N, D, H, W, C) or (N, H, W, C)
    mesh: Mesh,
    *,
    halo: int,
    shard_axis: int = 2,  # H for 3D volumes (axis after N, D)
    axis_name: str = DATA_AXIS,
    cross_shard_norm: bool = False,
) -> jax.Array:
    """Forward a single large volume sharded along one spatial axis.

    The volume's ``shard_axis`` extent must divide evenly by the mesh axis
    size, and ``halo`` must not exceed the per-shard extent.

    ``cross_shard_norm=True`` makes every GroupNorm psum its statistics
    across the mesh axis (interior rows only, each volume row counted
    exactly once — ops/norm.py ``cross_shard_group_stats``), so normalized
    layer orders like the 3D default 'gcr' produce the same result for ANY
    mesh width (including the single-device emulation); the default keeps
    per-shard statistics (the reference's patch semantics).  Requires
    ``halo`` divisible by ``2**(num_levels - 1)``.
    """
    n_shards = mesh.shape[axis_name]
    extent = volume.shape[shard_axis]
    assert extent % n_shards == 0, (
        f"spatial axis extent {extent} not divisible by {n_shards} shards"
    )
    shard_extent = extent // n_shards
    # strict: edge-shard reflection mirrors rows 1..halo, needing extent > halo
    assert 0 < halo < shard_extent, (
        f"halo {halo} must be in (0, shard extent {shard_extent})"
    )

    in_spec = [None] * volume.ndim
    in_spec[shard_axis] = axis_name
    in_spec = P(*in_spec)

    def per_shard(variables, x):
        x = _halo_exchange(x, halo, shard_axis, axis_name)
        if cross_shard_norm:
            from ..ops.norm import cross_shard_group_stats

            with cross_shard_group_stats(
                axis_name, shard_axis, halo, x.shape[shard_axis]
            ):
                out = model.apply(variables, x, False)
        else:
            out = model.apply(variables, x, False)
        slicer = [slice(None)] * out.ndim
        slicer[shard_axis] = slice(halo, -halo)
        return out[tuple(slicer)]

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), in_spec),
        out_specs=in_spec,
        check_rep=False,
    )
    return fn(variables, volume)


def _spec_for(ndim: int, shard_axis: int, axis_name: str) -> P:
    spec = [None] * ndim
    spec[shard_axis] = axis_name
    return P(*spec)


def make_spatial_train_step(
    model,
    criterion: Callable[[jax.Array, jax.Array], jax.Array],
    optimizer,
    mesh: Mesh,
    *,
    halo: int,
    shard_axis: int = 2,
    axis_name: str = DATA_AXIS,
    train: bool = True,
    donate: bool = True,
    cross_shard_norm: bool = False,
):
    """Build a jitted SPMD train step over ONE spatially-sharded volume.

    Each device holds a contiguous slab of the volume's ``shard_axis``;
    forward/backward run per shard with a ``halo``-row exchange over ICI
    (autodiff flows through :func:`_halo_exchange` — ``ppermute``'s
    transpose is the inverse permutation, so halo-region input gradients
    return to their home shard).

    Objective semantics: the step minimizes the MEAN of the per-shard
    criterion.  For per-pixel-mean losses (BCE, MSE, CE) this equals the
    monolithic global loss exactly (shards are equal-sized by the
    divisibility check); for ratio losses (Dice) it is per-shard-patch
    semantics — the same objective the reference's patch-based training
    already optimizes (its loaders feed SliceBuilder patches of large
    volumes to the trainer: reference dataset/unet3d_dataset/hdf5.py +
    train/unet3d_train/trainer.py), with the halo supplying the
    cross-boundary context those patches lack.  Normalization statistics
    are per-shard by default, matching the same patch-training semantics;
    ``cross_shard_norm=True`` psums GroupNorm statistics across the mesh
    axis instead, making the sharded step mesh-width-invariant (exact for
    normalized orders like the 3D default 'gcr'; needs ``halo`` divisible
    by ``2**(num_levels - 1)``).

    Dropout: each shard folds ``lax.axis_index`` into the step rng, so
    masks are independent across shards (like independent patches).

    Returns ``step(params, opt_state, volume, labels, rng) ->
    (params, opt_state, loss)`` with params/opt_state replicated and the
    volume/labels laid out with ``PartitionSpec`` sharding ``shard_axis``.
    """

    def per_shard(params, opt_state, x, y, rng):
        rng = jax.random.fold_in(rng, lax.axis_index(axis_name))

        def loss_fn(p):
            xh = _halo_exchange(x, halo, shard_axis, axis_name)
            kwargs = {"rngs": {"dropout": rng}} if train else {}
            if cross_shard_norm:
                from ..ops.norm import cross_shard_group_stats

                with cross_shard_group_stats(
                    axis_name, shard_axis, halo, xh.shape[shard_axis]
                ):
                    out = model.apply({"params": p}, xh, train, **kwargs)
            else:
                out = model.apply({"params": p}, xh, train, **kwargs)
            slicer = [slice(None)] * out.ndim
            slicer[shard_axis] = slice(halo, -halo)
            return criterion(out[tuple(slicer)], y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # total objective = mean over shards ⇒ combine local grads by pmean
        grads = lax.pmean(grads, axis_name)
        loss = lax.pmean(loss, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def checked(params, opt_state, volume, labels, rng):
        n_shards = mesh.shape[axis_name]
        extent = volume.shape[shard_axis]
        assert extent % n_shards == 0, (
            f"spatial axis extent {extent} not divisible by {n_shards} shards"
        )
        assert 0 < halo < extent // n_shards, (
            f"halo {halo} must be in (0, shard extent {extent // n_shards})"
        )
        spec = _spec_for(volume.ndim, shard_axis, axis_name)
        fn = shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(), spec, spec, P()),
            out_specs=(P(), P(), P()),
            check_rep=False,
        )
        return fn(params, opt_state, volume, labels, rng)

    return jax.jit(checked, donate_argnums=(0, 1) if donate else ())
