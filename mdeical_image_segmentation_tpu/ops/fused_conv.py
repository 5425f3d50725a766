"""Fused VMEM-resident conv blocks for the UNet stacks (Pallas TPU).

Motivation (PERF.md, round-2 profile of the UNet3D 'gcr' f_maps=32 b2 step,
110.6 ms): conv fusions 37.1 ms at ~6.5% MXU peak, copy/layout 35.5 ms of
relayouts around the slab (N,D,…)↔(N·D,…) reshapes and pool boundaries,
elementwise 24.2 ms.  Two kernels attack this:

1. ``fused_conv3d`` — the SingleConv('gcr') forward (reference
   buildingblocks.py:62-90): ``y = relu(conv3x3x3(a_c·x + b_c))`` with the
   GroupNorm *apply* (per-(sample, channel) affine from the pallas
   statistics kernels in ops/norm.py) done in registers on the tile just
   streamed in — the normalized tensor never exists in HBM.
2. ``fused_double2d`` — the classic UNet's DoubleConvolution (reference
   model/unet2d/unet.py:42-128): ``relu(conv(relu(conv(x)+b1))+b2)`` with
   the intermediate z resident in VMEM between the convs (z is still
   emitted once, write-only, as the conv2 kernel-grad residual).

Shared design:

- Convs are shift-and-matmul on a zero-framed VMEM copy of the tile: the
  (rows, W, C) tile sits at offset (·, 1) inside a (rows+…, W+2, C) frame,
  so every (dh, dw) tap is a CONTIGUOUS row-slice of the flattened frame
  and no boundary masking exists anywhere (the 2 garbage frame columns are
  cropped after the accumulate — ~2% wasted FLOPs).  Taps matmul as
  (rows·(W+2), Ci) × (Ci, Co) on the MXU with an fp32 VMEM accumulator;
  im2col mode concatenates the three W-shifts into a (·, 3Ci)×(3Ci, Co)
  product, tripling the contraction width (96 at Ci=32 against the
  128-wide MXU).
- VMEM lane-pads the channel dim to 128, so whole-plane buffers at C≤64
  don't fit the ~16 MB budget at full resolution.  The H axis is therefore
  TILED: the grid carries an H-tile index and the kernel receives the
  SAME input three times under different index maps (prev/cur/next tile,
  clamped at the edges) — halo rows come from the neighbor blocks' edge
  rows, with volume-edge halos zeroed in-kernel (conv zero-padding).
- The depth axis of the 3D kernel is a reduction grid dimension exactly
  like ops/conv3d.py's slab lowering — the kernel consumes (N, D, H, W, C)
  directly and the (N·D) reshape relayouts disappear from the forward.
- Only standard BlockSpec pipelines (no manual DMA) — the axon tunnel's
  remote-compile service rejects DMA kernels (PERF.md round 2), and the
  GroupNorm kernels built this way compile fine there.

Backwards are composed from already-fast parts (custom VJPs below): saved-
output ReLU masks, XLA slab-conv / linear-transpose conv grads, and the
pallas GroupNorm backward from ops/norm.py.  Only forwards needed kernels.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import norm as _norm
from .conv3d import slab_conv3d


def _pl():
    from jax.experimental import pallas as pl

    return pl


def _r8(x):
    return -(-x // 8) * 8


def _r128(x):
    return -(-x // 128) * 128


# Deliberately conservative: the measured scoped-VMEM footprint runs ~2x
# this estimate (bf16 sublane tiles are 16 rows, the pipeline holds extra
# copies, and Mosaic reserves stack) — an 11 MB estimate OOM'd the 16 MB
# limit at 20.06M on v5e (dc_base8_l1).  5 MB keeps the real footprint
# safely inside; TPUSEG_FUSED_HB overrides the tile height for tuning.
_VMEM_BUDGET = 5 * 2**20


def _conv_taps_into_acc(flat, wk, acc_ref, rows, w, ci, co, im2col,
                        im2_ref=None):
    """Accumulate the 9 (dh, dw) taps of a 3×3 conv into acc_ref.

    ``flat`` is the zero-framed ((rows+3)·(w+2), ci) view; acc has
    rows·(w+2) rows (garbage columns cropped by the caller).

    im2col mode stages the three W-shifts side-by-side in the ``im2_ref``
    VMEM scratch and matmuls (·, 3ci)×(3ci, co) — a value-level
    jnp.concatenate is NOT used because Mosaic cannot reconcile the
    differing sublane offsets of the three slices (measured:
    "result/input offset mismatch on non-concat dimension" on v5e)."""
    m2 = rows * (w + 2)
    # NOTE: plain Python slicing (lax.slice), NOT lax.dynamic_slice_in_dim —
    # offsets are static and Mosaic has no dynamic_slice lowering for
    # values (measured: bench's fused compile failed with "Unimplemented
    # primitive ... dynamic_slice" on v5e)
    if ci < 8:
        # tiny input channels (the stack's first conv: 1 or 3): a (·, ci)
        # matmul wastes the MXU and Mosaic's lane-concat of 1-lane vectors
        # is broken (measured INTERNAL tpu.concatenate failure on v5e) —
        # use 9·ci broadcast multiply-accumulates on the VPU instead
        for dh in range(3):
            for dw in range(3):
                s0 = dh * (w + 2) + dw
                opnd = flat[s0:s0 + m2].astype(jnp.float32)
                for c in range(ci):
                    acc_ref[...] += (
                        opnd[:, c:c + 1] * wk[dh, dw, c][None, :]
                    )
        return
    for dh in range(3):
        if im2col and im2_ref is not None:
            for dw in range(3):
                s0 = dh * (w + 2) + dw
                im2_ref[:m2, dw * ci:(dw + 1) * ci] = flat[s0:s0 + m2]
            acc_ref[...] += jnp.dot(
                im2_ref[:m2], wk[dh].reshape(3 * ci, co),
                preferred_element_type=jnp.float32,
            )
        else:
            for dw in range(3):
                s0 = dh * (w + 2) + dw
                opnd = flat[s0:s0 + m2]
                acc_ref[...] += jnp.dot(
                    opnd, wk[dh, dw], preferred_element_type=jnp.float32
                )


# ---------------------------------------------------------------------------
# 3D 'gcr' single-conv kernel
# ---------------------------------------------------------------------------


def _gcr_kernel(
    xp_ref,   # (1, 1, HB, W, Ci) prev H-tile (clamped)
    xc_ref,   # (1, 1, HB, W, Ci) current H-tile
    xn_ref,   # (1, 1, HB, W, Ci) next H-tile (clamped)
    w_ref,    # (KD, 3, 3, Ci, Co)
    a_ref,    # (N, Ci) fp32 per-sample affine scale
    b_ref,    # (N, Ci) fp32 per-sample affine shift
    y_ref,    # (1, 1, HB, W, Co)
    pad_ref,  # (HB+3, W+2, Ci) zero-framed tile, x dtype
    acc_ref,  # (HB·(W+2), Co) fp32
    *scratch,  # optional (HB·(W+2), 3Ci) im2col staging buffer
    kd: int,
    pre_relu: bool,
    post_relu: bool,
    im2col: bool,
):
    im2_ref = scratch[0] if scratch else None
    pl = _pl()
    n = pl.program_id(0)
    d = pl.program_id(1)
    t = pl.program_id(2)
    k = pl.program_id(3) if kd > 1 else 0
    nd = pl.num_programs(1)
    nt = pl.num_programs(2)
    hb, w, ci = pad_ref.shape[0] - 3, pad_ref.shape[1] - 2, pad_ref.shape[2]
    co = y_ref.shape[-1]

    @pl.when((n == 0) & (d == 0) & (t == 0) & (k == 0))
    def _():
        # zero the frame once: borders (cols 0 and W+1, the overhang row)
        # are never written again
        pad_ref[...] = jnp.zeros_like(pad_ref)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    d_src = d + k - (kd - 1) // 2
    valid = (d_src >= 0) & (d_src <= nd - 1)

    @pl.when(valid)
    def _():
        a = a_ref[pl.ds(n, 1), :].reshape(1, 1, ci).astype(jnp.float32)
        b = b_ref[pl.ds(n, 1), :].reshape(1, 1, ci).astype(jnp.float32)

        def aff(v):
            out = v.astype(jnp.float32) * a + b
            if pre_relu:
                out = jnp.maximum(out, 0.0)
            return out.astype(pad_ref.dtype)

        # frame row r holds tile row r-1: row 0 = prev tile's last row
        # (zero at the volume's top edge), rows 1..HB = this tile,
        # row HB+1 = next tile's first row (zero at the bottom edge)
        pad_ref[1:hb + 1, 1:w + 1, :] = aff(xc_ref[0, 0])
        top = jnp.where(t > 0, 1.0, 0.0).astype(jnp.float32)
        bot = jnp.where(t < nt - 1, 1.0, 0.0).astype(jnp.float32)
        pad_ref[0:1, 1:w + 1, :] = aff(
            xp_ref[0, 0, hb - 1:hb]
        ) * top.astype(pad_ref.dtype)
        pad_ref[hb + 1:hb + 2, 1:w + 1, :] = aff(
            xn_ref[0, 0, 0:1]
        ) * bot.astype(pad_ref.dtype)

        flat = pad_ref[...].reshape((hb + 3) * (w + 2), ci)
        wk = w_ref[pl.ds(k, 1)][0] if kd > 1 else w_ref[0]
        _conv_taps_into_acc(flat, wk, acc_ref, hb, w, ci, co, im2col,
                            im2_ref)

    @pl.when(k == kd - 1)
    def _():
        y = acc_ref[...].reshape(hb, w + 2, co)[:, :w, :]
        if post_relu:
            y = jnp.maximum(y, 0.0)
        y_ref[0, 0] = y.astype(y_ref.dtype)


def _pick_hb(h: int, need_fn, budget: int = _VMEM_BUDGET) -> Optional[int]:
    """Largest divisor of ``h`` whose working set fits the VMEM budget.

    ``TPUSEG_FUSED_HB`` forces a specific tile height (must divide H) —
    the tuning/testing override."""
    forced = os.environ.get("TPUSEG_FUSED_HB")
    if forced:
        hb = int(forced)
        return hb if h % hb == 0 else None
    for hb in sorted((x for x in range(1, h + 1) if h % x == 0),
                     reverse=True):
        if need_fn(hb) <= budget:
            return hb
    return None


def _gcr_need(w, ci, co, kd, itemsize, im2col=False):
    def need(hb):
        frame = (hb + 3) * (w + 2) * _r128(ci) * itemsize
        acc = hb * (w + 2) * _r128(co) * 4
        xblocks = 3 * 2 * hb * _r8(w) * _r128(ci) * itemsize
        yblocks = 2 * hb * _r8(w) * _r128(co) * itemsize
        wts = kd * 9 * _r8(ci) * _r128(co) * itemsize
        im2 = hb * (w + 2) * _r128(3 * ci) * itemsize if im2col else 0
        return frame + acc + xblocks + yblocks + wts + im2

    return need


def fused_conv3d(
    x: jax.Array,          # (N, D, H, W, Ci)
    kernel: jax.Array,     # (kd, 3, 3, Ci, Co)
    pre_scale: jax.Array,  # (N, Ci) fp32
    pre_shift: jax.Array,  # (N, Ci) fp32
    *,
    pre_relu: bool = False,
    post_relu: bool = True,
    im2col: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """``relu(conv(relu?(a·x + b)))`` with stride 1 and torch padding
    ``(k-1)//2`` per spatial dim.  ``kd`` ∈ {1, 3}."""
    pl = _pl()
    from jax.experimental.pallas import tpu as pltpu

    n, d, h, w, ci = x.shape
    kd = kernel.shape[0]
    co = kernel.shape[-1]
    if kd not in (1, 3) or kernel.shape[1:3] != (3, 3):
        raise ValueError(f"fused_conv3d supports (1|3, 3, 3) kernels, "
                         f"got {kernel.shape[:3]}")

    hb = _pick_hb(h, _gcr_need(w, ci, co, kd, x.dtype.itemsize,
                               im2col=im2col and ci >= 8))
    if hb is None:
        raise ValueError(
            f"no H tile of {x.shape} fits VMEM — gate with fused_gcr_mode"
        )
    nt = h // hb
    nd_max = d - 1
    off = (kd - 1) // 2

    def xspec(dt):
        return pl.BlockSpec(
            (1, 1, hb, w, ci),
            lambda i, j, t, k: (
                i,
                jnp.clip(j + k - off, 0, nd_max),
                jnp.clip(t + dt, 0, nt - 1),
                0, 0,
            ),
        )

    kern = functools.partial(
        _gcr_kernel, kd=kd, pre_relu=pre_relu, post_relu=post_relu,
        im2col=im2col,
    )
    return pl.pallas_call(
        kern,
        grid=(n, d, nt, kd),
        in_specs=[
            xspec(-1), xspec(0), xspec(+1),
            pl.BlockSpec(kernel.shape, lambda i, j, t, k: (0,) * 5),
            pl.BlockSpec((n, ci), lambda i, j, t, k: (0, 0)),
            pl.BlockSpec((n, ci), lambda i, j, t, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, hb, w, co), lambda i, j, t, k: (i, j, t, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n, d, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hb + 3, w + 2, ci), x.dtype),
            pltpu.VMEM((hb * (w + 2), co), jnp.float32),
        ] + (
            [pltpu.VMEM((hb * (w + 2), 3 * ci), x.dtype)]
            if im2col and ci >= 8 else []
        ),
        interpret=interpret,
    )(x, x, x, kernel, pre_scale.astype(jnp.float32),
      pre_shift.astype(jnp.float32))


# ---------------------------------------------------------------------------
# fused 2D DoubleConv (classic UNet's conv+bias+ReLU pair, no norm)
# ---------------------------------------------------------------------------
#
# relu(conv(relu(conv(x)+b1))+b2) has NO cross-batch statistics, so BOTH
# convs fuse into one kernel with the intermediate z resident in VMEM.
# z is still emitted to HBM once (write-only in the forward) as the conv2
# kernel-grad residual; vs the unfused path that's one full-tensor read
# saved per pair plus the relayout boundaries.  H-tiles carry a halo of
# TWO rows (one per conv): conv1 computes z rows [-1, HB+1) of the tile
# from x rows [-2, HB+2), conv2 then consumes exactly its interior.


def _double2d_kernel(
    xp_ref,    # (1, HB, W, Ci) prev tile (clamped)
    xc_ref,    # (1, HB, W, Ci)
    xn_ref,    # (1, HB, W, Ci) next tile (clamped)
    w1_ref,    # (3, 3, Ci, C1)
    b1_ref,    # (1, C1)
    w2_ref,    # (3, 3, C1, Co)
    b2_ref,    # (1, Co)
    y_ref,     # (1, HB, W, Co)
    z_ref,     # (1, HB, W, C1)
    padx_ref,  # (HB+7, W+2, Ci): x rows -2..HB+1 at frame rows 1..HB+4
    padz_ref,  # (HB+5, W+2, C1): z rows -1..HB at frame rows 1..HB+2
    acc1_ref,  # ((HB+3)·(W+2), C1) fp32
    acc2_ref,  # ((HB+2)·(W+2), Co) fp32
    *scratch,  # optional im2col staging buffers for the two convs
    im2col: bool,
):
    im2x_ref = scratch[0] if scratch else None
    im2z_ref = scratch[1] if len(scratch) > 1 else None
    pl = _pl()
    n = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    hb = xc_ref.shape[1]
    w = xc_ref.shape[2]
    ci = xc_ref.shape[3]
    c1 = padz_ref.shape[2]
    co = y_ref.shape[-1]

    @pl.when((n == 0) & (t == 0))
    def _():
        padx_ref[...] = jnp.zeros_like(padx_ref)
        padz_ref[...] = jnp.zeros_like(padz_ref)

    acc1_ref[...] = jnp.zeros_like(acc1_ref)
    acc2_ref[...] = jnp.zeros_like(acc2_ref)

    xdt = padx_ref.dtype
    top = jnp.where(t > 0, 1.0, 0.0).astype(xdt)
    bot = jnp.where(t < nt - 1, 1.0, 0.0).astype(xdt)
    # frame_x row r holds x tile row r-3 (x_{-2} at row 1)
    padx_ref[1:3, 1:w + 1, :] = xp_ref[0, hb - 2:hb] * top
    padx_ref[3:hb + 3, 1:w + 1, :] = xc_ref[0]
    padx_ref[hb + 3:hb + 5, 1:w + 1, :] = xn_ref[0, 0:2] * bot

    flatx = padx_ref[...].reshape((hb + 7) * (w + 2), ci)
    _conv_taps_into_acc(flatx, w1_ref[...], acc1_ref, hb + 3, w, ci, c1,
                        im2col, im2x_ref)

    b1 = b1_ref[0].astype(jnp.float32)
    # conv1 output row q1 = z_{q1-2}; z rows -1..HB live at q1 = 1..HB+2
    zfull = jnp.maximum(
        acc1_ref[...].reshape(hb + 3, w + 2, c1)[:, :w, :] + b1, 0.0
    ).astype(xdt)
    z_ref[0] = zfull[2:hb + 2]
    # frame_z row r holds z tile row r-2 (z_{-1} at row 1); volume-edge
    # halo rows are ZERO (conv2's own padding), not the computed values
    padz_ref[1:2, 1:w + 1, :] = zfull[1:2] * top
    padz_ref[2:hb + 2, 1:w + 1, :] = zfull[2:hb + 2]
    padz_ref[hb + 2:hb + 3, 1:w + 1, :] = zfull[hb + 2:hb + 3] * bot

    flatz = padz_ref[...].reshape((hb + 5) * (w + 2), c1)
    _conv_taps_into_acc(flatz, w2_ref[...], acc2_ref, hb + 2, w, c1, co,
                        im2col, im2z_ref)

    b2 = b2_ref[0].astype(jnp.float32)
    # conv2 output row q2 corresponds to y tile row q2-1; keep q2=1..HB
    y_ref[0] = jnp.maximum(
        acc2_ref[...].reshape(hb + 2, w + 2, co)[1:hb + 1, :w, :] + b2, 0.0
    ).astype(y_ref.dtype)


def _double_need(w, ci, c1, co, itemsize, im2col=False):
    def need(hb):
        fx = (hb + 7) * (w + 2) * _r128(ci) * itemsize
        fz = (hb + 5) * (w + 2) * _r128(c1) * itemsize
        a1 = (hb + 3) * (w + 2) * _r128(c1) * 4
        a2 = (hb + 2) * (w + 2) * _r128(co) * 4
        xb = 3 * 2 * hb * _r8(w) * _r128(ci) * itemsize
        yb = 2 * hb * _r8(w) * (_r128(co) + _r128(c1)) * itemsize
        wts = 9 * (_r8(ci) * _r128(c1) + _r8(c1) * _r128(co)) * itemsize
        im2 = (
            ((hb + 3) * (w + 2) * _r128(3 * ci) if ci >= 8 else 0)
            + (hb + 2) * (w + 2) * _r128(3 * c1)
        ) * itemsize if im2col else 0
        return fx + fz + a1 + a2 + xb + yb + wts + im2

    return need


def fused_double2d(
    x: jax.Array,   # (N, H, W, Ci)
    w1: jax.Array,  # (3, 3, Ci, C1)
    b1: jax.Array,  # (C1,)
    w2: jax.Array,  # (3, 3, C1, Co)
    b2: jax.Array,  # (Co,)
    *,
    im2col: bool = True,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(y, z) = the classic-UNet DoubleConvolution forward, z resident in
    VMEM between the convs (emitted once as the backward residual)."""
    pl = _pl()
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, ci = x.shape
    c1 = w1.shape[-1]
    co = w2.shape[-1]
    if w1.shape[:2] != (3, 3) or w2.shape[:2] != (3, 3):
        raise ValueError("fused_double2d supports 3x3 kernels only")

    hb = _pick_hb(h, _double_need(w, ci, c1, co, x.dtype.itemsize,
                                  im2col=im2col))
    if hb is None or hb < 2:
        raise ValueError(
            f"no H tile of {x.shape} fits VMEM — gate with "
            f"fused_double2d_mode"
        )
    nt = h // hb

    def xspec(dt):
        return pl.BlockSpec(
            (1, hb, w, ci),
            lambda i, t: (i, jnp.clip(t + dt, 0, nt - 1), 0, 0),
        )

    full = lambda shape: pl.BlockSpec(shape, lambda i, t: (0,) * len(shape))
    kern = functools.partial(_double2d_kernel, im2col=im2col)
    return pl.pallas_call(
        kern,
        grid=(n, nt),
        in_specs=[
            xspec(-1), xspec(0), xspec(+1),
            full(w1.shape), full((1, c1)), full(w2.shape), full((1, co)),
        ],
        out_specs=[
            pl.BlockSpec((1, hb, w, co), lambda i, t: (i, t, 0, 0)),
            pl.BlockSpec((1, hb, w, c1), lambda i, t: (i, t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
            jax.ShapeDtypeStruct((n, h, w, c1), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((hb + 7, w + 2, ci), x.dtype),
            pltpu.VMEM((hb + 5, w + 2, c1), x.dtype),
            pltpu.VMEM(((hb + 3) * (w + 2), c1), jnp.float32),
            pltpu.VMEM(((hb + 2) * (w + 2), co), jnp.float32),
        ] + (
            [
                pltpu.VMEM(((hb + 3) * (w + 2),
                            3 * ci if ci >= 8 else ci), x.dtype),
                pltpu.VMEM(((hb + 2) * (w + 2), 3 * c1), x.dtype),
            ]
            if im2col else []
        ),
        interpret=interpret,
    )(x, x, x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


def _conv2d_same(t, w):
    return lax.conv_general_dilated(
        t, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=lax.conv_dimension_numbers(
            t.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        ),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def double_conv2d(x, w1, b1, w2, b2, interpret=False):
    """relu(conv(relu(conv(x, w1) + b1), w2) + b2) — fused forward,
    composed backward (linear-transpose conv grads + saved relu masks,
    no forward recompute)."""
    y, _ = _dc_fwd(x, w1, b1, w2, b2, interpret)
    return y


def _dc_fwd(x, w1, b1, w2, b2, interpret):
    im2col = os.environ.get("TPUSEG_FUSED_IM2COL", "0") == "1"
    y, z = fused_double2d(
        x, w1, b1, w2, b2, im2col=im2col, interpret=interpret
    )
    return y, (x, z, y, w1, w2)


def _dc_bwd(interpret, res, g):
    x, z, y, w1, w2 = res
    gm2 = (g * (y > 0).astype(g.dtype)).astype(z.dtype)
    (dz,) = jax.linear_transpose(lambda t: _conv2d_same(t, w2), z)(gm2)
    (dw2,) = jax.linear_transpose(lambda w: _conv2d_same(z, w), w2)(gm2)
    db2 = jnp.sum(gm2.astype(jnp.float32), axis=(0, 1, 2)).astype(gm2.dtype)

    gm1 = (dz * (z > 0).astype(dz.dtype)).astype(x.dtype)
    (dx,) = jax.linear_transpose(lambda t: _conv2d_same(t, w1), x)(gm1)
    (dw1,) = jax.linear_transpose(lambda w: _conv2d_same(x, w), w1)(gm1)
    db1 = jnp.sum(gm1.astype(jnp.float32), axis=(0, 1, 2)).astype(gm1.dtype)
    return dx, dw1.astype(w1.dtype), db1, dw2.astype(w2.dtype), db2


double_conv2d.defvjp(_dc_fwd, _dc_bwd)


# ---------------------------------------------------------------------------
# mode selection
# ---------------------------------------------------------------------------


def _mode_env() -> str:
    mode = os.environ.get("TPUSEG_FUSED_CONV", "auto")
    if mode not in ("auto", "on", "off", "interpret"):
        raise ValueError(
            f"TPUSEG_FUSED_CONV={mode!r}: expected 'auto', 'on', 'off', "
            f"or 'interpret'"
        )
    return mode


def fused_gcr_mode(x_shape, x_dtype, ci: int, co: int) -> Optional[bool]:
    """None = don't fuse; False = fuse compiled; True = fuse interpreted.

    ``TPUSEG_FUSED_CONV``: 'auto' (currently OFF — see below), 'on'
    (opt-in on TPU), 'off', or 'interpret' (force with the pallas
    interpreter — CPU testing of the full integration).

    MEASURED NEGATIVE RESULT (round 3, v5e, scripts/tpu_r3_session.py):
    the fused kernel LOSES to the XLA slab path — UNet3D 'gcr' f_maps=32
    b2 train step 322 ms vs 110.7 baseline (f64 b1: 220 vs 108.6), fwd-
    only 196 vs 64 ms, XLA HBM estimate UP at 84.2 vs 68.6 GB; im2col ==
    naked taps (319.6 vs 322.2).  Root causes: the 3-block halo pattern
    re-fetches every input 3x, sub-128-lane VMEM blocks pad C=32 tiles
    4x, and Mosaic's matmul pipeline does not approach XLA's native conv
    emitter at these shapes.  'auto' therefore selects the XLA path; the
    kernel stays available under 'on' for future backends/layouts."""
    mode = _mode_env()
    if mode == "off" or len(x_shape) != 5:
        return None
    h, w = x_shape[2], x_shape[3]
    itemsize = jnp.dtype(x_dtype).itemsize
    fits = _pick_hb(h, _gcr_need(w, ci, co, 3, itemsize)) is not None
    if mode == "interpret":
        return True if fits else None
    if jax.default_backend() != "tpu":
        return None
    if mode == "on":
        return False if fits else None
    return None  # auto: measured slower than the XLA slab path


def fused_double2d_mode(x_shape, x_dtype, ci: int, c1: int, co: int):
    """Same contract as :func:`fused_gcr_mode`, for the 2D DoubleConv.

    MEASURED NEGATIVE RESULT (round 3, v5e): base16 256² train step
    947 ms/step fused vs 43.2 unfused (~22x) — at C=8/16 the (·, C)
    matmuls use ~1.5% of the MXU's lanes and the per-tile grid overhead
    dominates; the saved z-read cannot compensate.  'auto' selects the
    XLA path; 'on' keeps the kernel reachable."""
    mode = _mode_env()
    if mode == "off" or len(x_shape) != 4:
        return None
    h, w = x_shape[1], x_shape[2]
    itemsize = jnp.dtype(x_dtype).itemsize
    hb = _pick_hb(h, _double_need(w, ci, c1, co, itemsize))
    fits = hb is not None and hb >= 2
    if mode == "interpret":
        return True if fits else None
    if jax.default_backend() != "tpu":
        return None
    if mode == "on":
        return False if fits else None
    return None  # auto: measured far slower than the XLA conv pair


# ---------------------------------------------------------------------------
# the full 'gcr' block with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gcr_fused_conv(
    x: jax.Array,
    gn_scale: jax.Array,
    gn_bias: jax.Array,
    kernel: jax.Array,
    num_groups: int,
    eps: float,
    interpret: bool = False,
) -> jax.Array:
    """``relu(conv3d(group_norm(x)))`` — the SingleConv('gcr') forward
    (reference buildingblocks.py:62-90) with the normalized tensor never
    materialized in HBM.

    Statistics ride the pallas GroupNorm reduction kernels (ops/norm.py);
    the normalize-affine + conv + ReLU run in one pallas kernel; the
    backward composes the saved-output ReLU mask, XLA slab-conv grads, and
    the pallas GroupNorm backward.
    """
    y, _ = _gcr_fwd(x, gn_scale, gn_bias, kernel, num_groups, eps, interpret)
    return y


def _gcr_stats(x, num_groups, eps, interpret):
    n, d, h, w, c = x.shape
    m = float(d * h * w * (c // num_groups))
    if interpret or jax.default_backend() != "tpu":
        mean, inv, _ = _norm._group_stats(x, num_groups, eps)
        cg = c // num_groups
        return (_norm._expand_groups(mean, cg), _norm._expand_groups(inv, cg))
    x4 = x.reshape(n, d, h, w * c)
    return _norm._gn_pallas_stats(x4, w, c, num_groups, eps, m, interpret)


def _gcr_fwd(x, gn_scale, gn_bias, kernel, num_groups, eps, interpret):
    mean_c, inv_c = _gcr_stats(x, num_groups, eps, interpret)
    a, b = _norm._gn_affine_coeffs(mean_c, inv_c, gn_scale, gn_bias)
    # TPUSEG_FUSED_IM2COL=0 switches the kernel to 9 naked (·, Ci)×(Ci, Co)
    # tap matmuls instead of 3 concatenated (·, 3Ci)×(3Ci, Co) ones — an
    # A/B knob for the TPU measurement session
    im2col = os.environ.get("TPUSEG_FUSED_IM2COL", "0") == "1"
    y = fused_conv3d(
        x, kernel, a, b, post_relu=True, im2col=im2col, interpret=interpret
    )
    return y, (x, mean_c, inv_c, gn_scale, gn_bias, kernel, y)


def _gcr_bwd(num_groups, eps, interpret, res, g):
    x, mean_c, inv_c, gn_scale, gn_bias, kernel, y = res
    kd = kernel.shape[0]
    pad = [((kd - 1) // 2,) * 2, (1, 1), (1, 1)]

    gm = (g * (y > 0).astype(g.dtype)).astype(g.dtype)
    # recompute the normalized input (one fused XLA pass; the fused forward
    # deliberately never stored it) — with the true β so the kernel-grad
    # sees the exact forward operand
    a, b = _norm._gn_affine_coeffs(mean_c, inv_c, gn_scale, gn_bias)
    xaff = (
        x.astype(jnp.float32) * _norm._bcast(a, x.ndim)
        + _norm._bcast(b, x.ndim)
    ).astype(x.dtype)

    _, conv_vjp = jax.vjp(
        lambda t, k: slab_conv3d(t, k, padding=pad), xaff, kernel
    )
    dxa, dw = conv_vjp(gm)

    if interpret or jax.default_backend() != "tpu":
        dx, dscale, dbias = _gcr_bwd_gn_xla(
            x, mean_c, inv_c, gn_scale, dxa, num_groups
        )
    else:
        dx, dscale, dbias = _norm._gn_bwd_hybrid(
            num_groups, eps, (x, mean_c, inv_c, gn_scale), dxa
        )
    return dx, dscale, dbias, dw


def _gcr_bwd_gn_xla(x, mean_c, inv_c, scale, g, num_groups):
    """Portable GN backward from the hybrid residual (CPU test path)."""
    n, c = x.shape[0], x.shape[-1]
    m = float(np.prod(x.shape[1:-1]) * (c // num_groups))
    axes = tuple(range(1, x.ndim - 1))
    gf = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    xhat = (xf - _norm._bcast(mean_c, x.ndim)) * _norm._bcast(inv_c, x.ndim)
    c1 = jnp.sum(gf, axis=axes)
    c2 = jnp.sum(gf * xhat, axis=axes)
    dbias = jnp.sum(c1, axis=0).astype(scale.dtype)
    dscale = jnp.sum(c2, axis=0).astype(scale.dtype)
    a, cc, dd = _norm._gn_bwd_coeffs(
        c1, c2, mean_c, inv_c, scale, num_groups, m
    )
    dx = (
        gf * _norm._bcast(a, x.ndim)
        + xf * _norm._bcast(cc, x.ndim)
        + _norm._bcast(dd, x.ndim)
    )
    return dx.astype(x.dtype), dscale, dbias


def _gcr_fwd_vjp(x, gn_scale, gn_bias, kernel, num_groups, eps, interpret):
    return _gcr_fwd(x, gn_scale, gn_bias, kernel, num_groups, eps, interpret)


gcr_fused_conv.defvjp(_gcr_fwd_vjp, _gcr_bwd)
