"""Image-space ops with PyTorch-parity semantics, laid out for TPU.

All ops take channels-last arrays (NHWC / NDHWC) — the native TPU conv layout —
and are shape-static so XLA can tile them onto the VPU/MXU.

Parity notes (the cross-framework traps called out in SURVEY.md §7):

- ``max_pool2d(..., ceil_mode=True)`` matches ``nn.MaxPool2d(k, s, ceil_mode=True)``
  (reference model/unet2d/unet.py:175-187): the input is virtually padded on the
  high side with -inf so tail windows are kept; torch additionally drops a tail
  window that would start entirely in the padding — replicated here.
- ``upsample_bilinear2d(..., align_corners=False)`` matches
  ``nn.Upsample(mode="bilinear")`` (unet.py:198-315);
  ``align_corners=True`` matches ``nn.UpsamplingBilinear2d`` (layers.py:58,85).
  Both are implemented as separable 1-D interpolation matmuls, which XLA maps
  onto the MXU instead of gather pipelines.
- ``center_crop`` matches ``torchvision.transforms.functional.center_crop``
  (layers.py:171-192) including the odd-remainder rounding.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

IntOrSeq = Union[int, Sequence[int]]


def _tuplify(v: IntOrSeq, n: int) -> Tuple[int, ...]:
    if isinstance(v, int):
        return (n * (v,))
    t = tuple(v)
    assert len(t) == n, (v, n)
    return t


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------

_POOL_MODES = ("auto", "pairwise", "depth2d", "native")


def _pool_mode() -> str:
    """TPUSEG_POOL env knob: 'auto' (= native), 'pairwise', 'depth2d',
    'native'.  Strict: typos raise immediately on every platform.

    Measured NEGATIVE on v5e (scripts/tpu_r3c_session.py, PERF.md): the
    pairwise form is bit-exact but the (W) → (W/2, 2) reshape forces
    sublane relayouts that cost more than the select_and_scatter backward
    it removes (UNet3D f32 b2: 103.1 vs 95.4 ms/step) — so 'auto' keeps
    the reduce_window path and 'pairwise' is opt-in.  'depth2d' splits a
    5D pool into a 2D (H, W) reduce_window + a leading-axis depth select
    (no minor-axis reshape, unlike 'pairwise') — measured WIN on v5e
    (scripts/tpu_r4_session.py: UNet3D 'gcr' f64 b1 91.3 → 86.2 ms/step,
    f32 b2 95.6 → 93.4; the 2D windowed ops keep the slab-conv layout, so
    the pool-boundary relayout copies shrink), so 'auto' = depth2d on TPU
    for eligible 5D pools and native elsewhere."""
    mode = os.environ.get("TPUSEG_POOL", "auto")
    if mode not in _POOL_MODES:
        raise ValueError(
            f"TPUSEG_POOL={mode!r} not in {_POOL_MODES}"
        )
    return mode


def _max_pool_pairwise(x: jax.Array, win: Tuple[int, ...]) -> jax.Array:
    """Non-overlapping max pool as reshape + first-wins pairwise selects.

    ``lax.reduce_window(max)``'s backward lowers to ``select_and_scatter``
    (3.8 ms/step in the UNet3D profile, PERF.md).  For window == stride with
    evenly dividing input, the pool is a reshape splitting each pooled axis
    into (out, w) plus a fold over the w axes — and folding with
    ``jnp.where(acc >= nxt, acc, nxt)`` (NOT ``lax.max``) makes the VJP a
    chain of fused elementwise selects whose tie behavior routes the whole
    gradient to the FIRST max in window scan order: identical to
    select_and_scatter's ge-select and torch's MaxPool backward.
    (``lax.max`` would split ties evenly — a semantics change.)
    NaN caveat: ``where(a >= b)`` picks b when acc is NaN instead of
    propagating; pooled activations are finite by construction.
    """
    nsp = len(win)
    # floor mode drops a non-dividing tail — crop it so the reshape is exact
    if any(size % w for size, w in zip(x.shape[1:-1], win)):
        x = x[
            tuple([slice(None)] + [slice(0, (s // w) * w) for s, w in zip(x.shape[1:-1], win)])
        ]
    shape = [x.shape[0]]
    for size, w in zip(x.shape[1:-1], win):
        shape += [size // w, w]
    shape.append(x.shape[-1])
    xr = x.reshape(shape)
    # Fold the w axes innermost-spatial-first so ties resolve in row-major
    # (d, h, w) window scan order, matching torch.
    for i in reversed(range(nsp)):
        ax = 2 + 2 * i
        acc = lax.index_in_dim(xr, 0, ax, keepdims=False)
        for j in range(1, win[i]):
            nxt = lax.index_in_dim(xr, j, ax, keepdims=False)
            acc = jnp.where(acc >= nxt, acc, nxt)
        xr = acc
    return xr


def _max_pool_depth2d(
    x: jax.Array, win: Tuple[int, ...], strd: Tuple[int, ...], pads
) -> jax.Array:
    """5D max pool as a 2D (H, W) ``reduce_window`` + leading-axis depth
    select.

    The native 3D window forces its own 5D layout at the pool boundary
    (profiled relayout copies around ``select_and_scatter``, PERF.md); here
    the windowed op is the same 2D reduce_window the conv path's slab
    tensors already use, and the depth reduction is a (N, D) → (N, D/wd,
    wd) *leading-axis* reshape + first-wins selects — no sublane movement
    (the 'pairwise' mode's W-axis reshape was the measured cost).

    Tie semantics match native/torch exactly: the 2D pool routes to the
    first (h, w) max per depth plane, and the depth select keeps the
    lowest d on plane-max ties — the composition routes the gradient to
    the first max in row-major (d, h, w) window scan order, identical to
    ``select_and_scatter``'s ge-select.  Same NaN caveat as the pairwise
    mode (``where(acc >= nxt)`` picks nxt when acc is NaN).
    """
    n, d = x.shape[:2]
    wd = win[0]
    init = (
        -jnp.inf
        if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min
    )
    y = lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, 1, win[1], win[2], 1),
        window_strides=(1, 1, strd[1], strd[2], 1),
        padding=((0, 0), (0, 0), pads[1], pads[2], (0, 0)),
    )
    yr = y.reshape(n, d // wd, wd, *y.shape[2:])
    acc = lax.index_in_dim(yr, 0, 2, keepdims=False)
    for j in range(1, wd):
        nxt = lax.index_in_dim(yr, j, 2, keepdims=False)
        acc = jnp.where(acc >= nxt, acc, nxt)
    return acc


def max_pool_nd(
    x: jax.Array,
    window: IntOrSeq,
    stride: IntOrSeq | None = None,
    *,
    ceil_mode: bool = False,
) -> jax.Array:
    """Max pool over the spatial dims of a channels-last array (N, *spatial, C).

    Torch-parity: ``nn.MaxPool{2,3}d(window, stride, ceil_mode=ceil_mode)`` with
    zero padding.  With ``ceil_mode=True`` tail windows are included unless they
    would start entirely beyond the (unpadded) input — torch's documented rule.
    """
    nsp = x.ndim - 2
    win = _tuplify(window, nsp)
    strd = _tuplify(stride if stride is not None else window, nsp)

    pads = []
    for size, w, s in zip(x.shape[1:-1], win, strd):
        if ceil_mode:
            out = -(-(size - w) // s) + 1  # ceil
            # torch: last window must start inside the input (not in padding)
            if (out - 1) * s >= size:
                out -= 1
        else:
            out = (size - w) // s + 1
        pad_hi = max(0, (out - 1) * s + w - size)
        pads.append((0, pad_hi))

    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int8)
    mode = _pool_mode()
    if (
        mode == "pairwise"
        and win == strd
        and all(p == (0, 0) for p in pads)
    ):
        # pads all-zero with win == strd implies every spatial dim divides
        # evenly (ceil_mode included) — the pairwise form is exact here.
        return _max_pool_pairwise(x, win)
    if (
        (mode == "depth2d"
         or (mode == "auto" and jax.default_backend() == "tpu"))
        and nsp == 3
        and win[0] > 1
        and win[0] == strd[0]
        and pads[0] == (0, 0)
        and x.shape[1] % win[0] == 0
    ):
        return _max_pool_depth2d(x, win, strd, pads)
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, *win, 1),
        window_strides=(1, *strd, 1),
        padding=((0, 0), *pads, (0, 0)),
    )


max_pool2d = max_pool_nd


def avg_pool_nd(
    x: jax.Array,
    window: IntOrSeq,
    stride: IntOrSeq | None = None,
) -> jax.Array:
    """Average pool (no padding), torch ``nn.AvgPool{2,3}d`` parity."""
    nsp = x.ndim - 2
    win = _tuplify(window, nsp)
    strd = _tuplify(stride if stride is not None else window, nsp)
    # NOTE: the init value must be a *literal* zero (not a traced array) so
    # lax dispatches to the monoid reduce_window_sum, which has a reverse-mode
    # transpose rule; a traced init falls into the generic reduce_window path
    # that fails to linearize under jit.
    summed = lax.reduce_window(
        x,
        np.zeros((), x.dtype),
        lax.add,
        window_dimensions=(1, *win, 1),
        window_strides=(1, *strd, 1),
        padding="VALID",
    )
    return summed / np.prod(win)


# ---------------------------------------------------------------------------
# Resize / upsample (separable interpolation matmuls — MXU-friendly)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=256)
def _linear_resize_matrix(
    in_size: int, out_size: int, align_corners: bool
) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix.

    align_corners=False: source coordinate = (i + 0.5) * in/out - 0.5, clamped
    (torch ``nn.Upsample(mode='bilinear', align_corners=False)``).
    align_corners=True: source = i * (in-1)/(out-1)
    (torch ``nn.UpsamplingBilinear2d``).
    """
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
            src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


@functools.lru_cache(maxsize=256)
def _nearest_resize_index(in_size: int, out_size: int) -> np.ndarray:
    """Index map for torch ``nn.Upsample(mode='nearest')`` / F.interpolate nearest:
    src = floor(i * in / out)."""
    return np.minimum(
        (np.arange(out_size) * in_size // out_size), in_size - 1
    ).astype(np.int32)


def resize_bilinear(
    x: jax.Array, out_spatial: Sequence[int], *, align_corners: bool = False
) -> jax.Array:
    """Bilinear resize of a channels-last array (N, *spatial, C) to `out_spatial`.

    Implemented as one 1-D interpolation matmul per spatial axis so XLA lowers
    it to MXU matmuls (a gather-free formulation; for ×2..×16 upsamples the
    matrices are tiny and fuse with the surrounding convs).
    Supports 2 or 3 spatial dims (trilinear for 3).
    """
    nsp = x.ndim - 2
    out_spatial = tuple(out_spatial)
    assert len(out_spatial) == nsp
    orig_dtype = x.dtype
    y = x.astype(jnp.float32) if x.dtype != jnp.float32 else x
    for axis_i, out_size in enumerate(out_spatial):
        axis = 1 + axis_i
        in_size = y.shape[axis]
        if in_size == out_size:
            continue
        mat = jnp.asarray(_linear_resize_matrix(in_size, out_size, align_corners))
        y = jnp.tensordot(mat, y, axes=[[1], [axis]])  # out axis to front
        y = jnp.moveaxis(y, 0, axis)
    return y.astype(orig_dtype)


def upsample_bilinear2d(
    x: jax.Array, scale: int, *, align_corners: bool = False
) -> jax.Array:
    """`nn.Upsample(scale_factor=scale, mode='bilinear')` parity for NHWC."""
    n, h, w, c = x.shape
    return resize_bilinear(x, (h * scale, w * scale), align_corners=align_corners)


def interpolate_nearest_nd(x: jax.Array, out_spatial: Sequence[int]) -> jax.Array:
    """Torch ``F.interpolate(mode='nearest')`` parity for channels-last arrays.

    Used by the 3D decoders' InterpolateUpsampling
    (reference model/unet3d/buildingblocks.py:642-687).
    """
    nsp = x.ndim - 2
    out_spatial = tuple(out_spatial)
    assert len(out_spatial) == nsp
    y = x
    for axis_i, out_size in enumerate(out_spatial):
        axis = 1 + axis_i
        in_size = y.shape[axis]
        if in_size == out_size:
            continue
        if out_size % in_size == 0:
            # integer-factor upsample: nearest indices are exactly
            # floor(o·in/out) = o // k, i.e. each element repeated k times —
            # a broadcast+reshape, whose transpose is a cheap reshape-sum.
            # The gather form's transpose is a scatter-add: measured on v5e
            # (scripts/tpu_r3_session.py POOL=1, ×2 on the largest 3D
            # decoder level) fwd+bwd 6.38 ms gather vs 1.59 ms repeat.
            k = out_size // in_size
            shape = list(y.shape)
            y = jnp.broadcast_to(
                jnp.expand_dims(y, axis + 1),
                shape[:axis + 1] + [k] + shape[axis + 1:],
            ).reshape(shape[:axis] + [out_size] + shape[axis + 1:])
            continue
        idx = jnp.asarray(_nearest_resize_index(in_size, out_size))
        y = jnp.take(y, idx, axis=axis)
    return y


def upsample_nearest(x: jax.Array, scale: int) -> jax.Array:
    """Integer-factor nearest upsampling of all spatial dims (channels-last)."""
    spatial = tuple(s * scale for s in x.shape[1:-1])
    return interpolate_nearest_nd(x, spatial)


# ---------------------------------------------------------------------------
# Crop / concat
# ---------------------------------------------------------------------------


def center_crop(x: jax.Array, out_spatial: Sequence[int]) -> jax.Array:
    """Center-crop spatial dims of a channels-last array.

    Torchvision parity (used by CropAndConcat, reference
    model/unet2d/layers.py:171-192): crop offset = round((in - out) / 2) with
    banker's-free torch semantics (// 2 after int truncation); pads with zeros
    if the requested size is larger.
    """
    nsp = x.ndim - 2
    out_spatial = tuple(out_spatial)
    assert len(out_spatial) == nsp
    pads = [(0, 0)]
    slices = [slice(None)]
    need_pad = False
    for in_size, out_size in zip(x.shape[1:-1], out_spatial):
        if out_size > in_size:
            lo = (out_size - in_size + 1) // 2
            pads.append((lo, out_size - in_size - lo))
            slices.append(slice(None))
            need_pad = True
        else:
            # torchvision: crop_top = int(round((in - out) / 2.)) — banker's
            # rounding, which Python's round() reproduces.
            off = int(round((in_size - out_size) / 2.0))
            pads.append((0, 0))
            slices.append(slice(off, off + out_size))
    pads.append((0, 0))
    slices.append(slice(None))
    if need_pad:
        x = jnp.pad(x, pads)
    return x[tuple(slices)]
