"""Device-side overlap-add accumulation for sliding-window inference.

The reference accumulates patch predictions into the output volume on the
host (predictor.py:147-149: ``prediction_map[index] += pred``), which
serializes TPU inference behind host scatter loops.  Here the accumulation
runs on device, streamed batch-by-batch:

- ``overlap_add_into_pallas`` — a Pallas TPU kernel: the accumulator volume
  stays in HBM, each patch's region is DMA'd into VMEM, the patch added, and
  the region DMA'd back; patch start offsets are scalar-prefetched
  (PrefetchScalarGridSpec).  TPU grid steps run sequentially, so the
  read-modify-write is race-free by construction.
- ``overlap_add_into_xla`` — portable fallback with ``lax.fori_loop`` +
  ``dynamic_update_slice`` (CPU backend and the numerics oracle).

API: ``overlap_add_into(acc, cnt, patches, starts, valid)`` adds each valid
patch at its (z, y, x) start into the running (D, H, W, C) sum and count
maps; ``valid`` masks padded tail-batch entries so batch shapes stay static.
Counts are float32 — the reference's uint8 normalization mask would overflow
silently past 255 overlaps.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def overlap_add_into_xla(
    acc: jax.Array,  # (D, H, W, C)
    cnt: jax.Array,  # (D, H, W, C)
    patches: jax.Array,  # (P, pd, ph, pw, C)
    starts: jax.Array,  # (P, 3) int32
    valid: jax.Array,  # (P,) bool/float
) -> Tuple[jax.Array, jax.Array]:
    p, pd, ph, pw, c = patches.shape

    def body(i, carry):
        a, ct = carry
        w = valid[i].astype(patches.dtype)
        z, y, x = starts[i, 0], starts[i, 1], starts[i, 2]
        idx = (z, y, x, 0)
        region = lax.dynamic_slice(a, idx, (pd, ph, pw, c))
        a = lax.dynamic_update_slice(a, region + w * patches[i], idx)
        region_c = lax.dynamic_slice(ct, idx, (pd, ph, pw, c))
        ct = lax.dynamic_update_slice(ct, region_c + w, idx)
        return a, ct

    return lax.fori_loop(0, p, body, (acc, cnt))


def _overlap_kernel(
    starts_ref,  # scalar-prefetch: (P, 4) int32 [z, y, x, valid] in SMEM
    patches_ref,  # (1, pd, ph, pw, C) VMEM block (current patch)
    acc_in_ref,  # aliased with acc_ref (same buffer)
    cnt_in_ref,  # aliased with cnt_ref (same buffer)
    acc_ref,  # (D, H, W, C) output in ANY/HBM
    cnt_ref,  # (D, H, W, C) output in ANY/HBM
    scratch_ref,  # (pd, ph, pw, C) VMEM
    cnt_scratch_ref,  # (pd, ph, pw, C) VMEM
    sem,  # DMA semaphores (4,)
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    del acc_in_ref, cnt_in_ref
    i = pl.program_id(0)
    pd, ph, pw, c = scratch_ref.shape
    z = starts_ref[i, 0]
    y = starts_ref[i, 1]
    x = starts_ref[i, 2]
    w = starts_ref[i, 3].astype(scratch_ref.dtype)

    region = lambda ref: ref.at[
        pl.ds(z, pd), pl.ds(y, ph), pl.ds(x, pw), pl.ds(0, c)
    ]

    in_dma = pltpu.make_async_copy(region(acc_ref), scratch_ref, sem.at[0])
    in_dma.start()
    cin_dma = pltpu.make_async_copy(region(cnt_ref), cnt_scratch_ref, sem.at[1])
    cin_dma.start()
    in_dma.wait()
    cin_dma.wait()

    scratch_ref[...] = scratch_ref[...] + w * patches_ref[0]
    cnt_scratch_ref[...] = cnt_scratch_ref[...] + w

    out_dma = pltpu.make_async_copy(scratch_ref, region(acc_ref), sem.at[2])
    out_dma.start()
    cout_dma = pltpu.make_async_copy(cnt_scratch_ref, region(cnt_ref), sem.at[3])
    cout_dma.start()
    out_dma.wait()
    cout_dma.wait()


def overlap_add_into_pallas(
    acc: jax.Array,
    cnt: jax.Array,
    patches: jax.Array,
    starts: jax.Array,
    valid: jax.Array,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p, pd, ph, pw, c = patches.shape
    meta = jnp.concatenate(
        [starts.astype(jnp.int32), valid.astype(jnp.int32)[:, None]], axis=1
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, pd, ph, pw, c), lambda i, s: (i, 0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((pd, ph, pw, c), patches.dtype),
            pltpu.VMEM((pd, ph, pw, c), patches.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    fn = pl.pallas_call(
        _overlap_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(acc.shape, acc.dtype),
            jax.ShapeDtypeStruct(cnt.shape, cnt.dtype),
        ],
        # indices count the scalar-prefetch arg: 0=meta, 1=patches, 2=acc, 3=cnt
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return fn(meta, patches, acc, cnt)


def overlap_add_into(
    acc: jax.Array,
    cnt: jax.Array,
    patches: jax.Array,
    starts: jax.Array,
    valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Backend-dispatching accumulate.

    The XLA ``fori_loop`` + ``dynamic_update_slice`` accumulate is the
    DEFAULT everywhere (round-3 decision): this environment's TPU
    remote-compile service has rejected the DMA kernel in two consecutive
    rounds, so the shipped default and the tested behavior now coincide.
    ``TPUSEG_PALLAS_OVERLAP=1`` opts back into the pallas kernel on TPU
    (kept for locally-attached chips whose toolchain builds DMA kernels;
    the predictor still auto-falls-back if the compile fails).
    ``TPUSEG_NO_PALLAS_OVERLAP=1`` (the old kill-switch) keeps forcing
    XLA and overrides the opt-in."""
    import os

    if valid is None:
        valid = jnp.ones((patches.shape[0],), jnp.float32)
    if (
        jax.default_backend() == "tpu"
        and os.environ.get("TPUSEG_PALLAS_OVERLAP") == "1"
        and not os.environ.get("TPUSEG_NO_PALLAS_OVERLAP")
    ):
        return overlap_add_into_pallas(acc, cnt, patches, starts, valid)
    return overlap_add_into_xla(acc, cnt, patches, starts, valid)


def overlap_add(
    patches: jax.Array,
    starts: jax.Array,
    volume_shape: Tuple[int, int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Accumulate a full patch set into fresh zero maps.

    Both maps are float32 regardless of the patch dtype: a bf16 count grid
    stops resolving integers past 256 (the very >255-overlap corruption the
    module exists to avoid), and bf16 accumulation would round every add.
    The patches themselves may stay bf16 — the adds upcast."""
    c = patches.shape[-1]
    acc = jnp.zeros((*volume_shape, c), jnp.float32)
    cnt = jnp.zeros((*volume_shape, c), jnp.float32)
    return overlap_add_into(acc, cnt, patches, starts)
