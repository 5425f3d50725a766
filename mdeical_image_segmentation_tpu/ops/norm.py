"""Bandwidth-lean GroupNorm for the 3D 'gcr' conv stacks.

Why this exists: ``flax.linen.GroupNorm`` promotes the *whole activation
tensor* to float32 to normalize (flax normalization.py `_normalize`), so
under bf16 compute every GroupNorm materializes fp32 full-size intermediates,
forces the autodiff residuals saved by the surrounding conv fusions to fp32,
and makes XLA insert big layout copies around the (…, G, C/G) group reshape.
Profiling the UNet3D 'gcr' train step on v5e (scripts/tpu_3d_profile.py)
attributed ~60% of the 289 ms step to exactly this: 89 ms of copies + 86 ms
of elementwise/convert passes on fp32 tensors, with convs at 9% of peak.

This implementation keeps every full-tensor load/store in the input dtype
(bf16 in the trainers) and does float32 math only in-register and on the
per-(sample, group) statistics:

- forward: one fused reduction pass over ``x`` produces per-channel fp32
  sums (no big group reshape — channel sums are combined into group stats on
  a tiny (N, C) array), then one elementwise pass normalizes in fp32
  registers and stores both x̂ and the affine output in ``x.dtype``.
- backward (custom VJP): the residual is the *normalized* x̂ in ``x.dtype``
  plus (N, G) inverse-stddevs.  Saving x̂ (not ``x``) means the backward
  never rebuilds it — profiling the first custom-VJP cut (residual = x,
  fp32 x̂ recomputed in the backward) showed XLA materializing the fp32 x̂
  for its two consumers and inserting ~3 ms layout copies per decoder
  GroupNorm between the reduce fusions and the dx pass.  With x̂ saved,
  both backward passes (per-channel reductions of (g, g·x̂); the group-norm
  input gradient) read only bf16 tensors.

Numerics match ``nn.GroupNorm`` (biased variance via max(0, E[x²]−E[x]²),
epsilon inside rsqrt) to float rounding; parity with the torch reference is
covered by the existing UNet3D pixel goldens (reference
model/unet3d/buildingblocks.py:81-90 uses torch nn.GroupNorm).
"""

from __future__ import annotations

import contextlib
import functools
import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _spatial_axes(x: jax.Array) -> tuple:
    return tuple(range(1, x.ndim - 1))


def _group_stats(x: jax.Array, num_groups: int, eps: float):
    """Per-(sample, group) fp32 mean and rsqrt(var + eps).

    Reduces per-channel first so the big tensor is touched once and never
    reshaped; the group combine runs on a tiny (N, C) array.
    """
    n, c = x.shape[0], x.shape[-1]
    cg = c // num_groups
    axes = _spatial_axes(x)
    m = float(np.prod([x.shape[a] for a in axes]) * cg)
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=axes)  # (N, C)
    s2 = jnp.sum(jnp.square(xf), axis=axes)  # (N, C)
    gs1 = jnp.sum(s1.reshape(n, num_groups, cg), axis=-1)
    gs2 = jnp.sum(s2.reshape(n, num_groups, cg), axis=-1)
    mean = gs1 / m  # (N, G)
    var = jnp.maximum(0.0, gs2 / m - jnp.square(mean))
    return mean, lax.rsqrt(var + eps), m


def _per_channel(stat: jax.Array, cg: int, x_ndim: int) -> jax.Array:
    """(N, G) → (N, 1, …, 1, C) fp32 broadcastable against x."""
    n = stat.shape[0]
    c = stat.shape[1] * cg
    out = jnp.repeat(stat, cg, axis=-1)
    return out.reshape((n,) + (1,) * (x_ndim - 2) + (c,))


# ---------------------------------------------------------------------------
# Cross-shard (spatially-sharded) statistics mode
# ---------------------------------------------------------------------------
#
# Under spatial sharding (parallel/spatial.py) each device sees a
# halo-extended slab of one volume; the default GroupNorm then computes
# per-slab statistics — patch semantics.  With the context below active,
# GroupNorm instead psums the per-group sufficient statistics across the
# spatial mesh axis, with each shard contributing only its INTERIOR rows
# (halo rows are duplicates of neighbor interiors, and edge-shard halos are
# reflect-pads), so every volume row is counted exactly once and the
# statistics equal the global ones — sharded == the monolithic patch
# forward for normalized layer orders, independent of the mesh width.
#
# The cross-shard path is a plain autodiff-able jnp+psum implementation (no
# custom VJP, no pallas): `lax.psum` inside shard_map transposes correctly,
# so the backward gets the exact cross-shard statistic gradients for free.

_CROSS_SHARD_CTX: Optional[dict] = None


@contextlib.contextmanager
def cross_shard_group_stats(
    axis_name: str, shard_axis: int, halo: int, padded_extent: int
):
    """Trace-time switch: GroupNorms applied inside this context psum their
    statistics over ``axis_name`` (mask = interior rows of ``shard_axis``,
    whose halo-padded extent at model input is ``padded_extent``)."""
    global _CROSS_SHARD_CTX
    prev = _CROSS_SHARD_CTX
    _CROSS_SHARD_CTX = dict(
        axis_name=axis_name, shard_axis=shard_axis, halo=halo,
        padded_extent=padded_extent,
    )
    try:
        yield
    finally:
        _CROSS_SHARD_CTX = prev


def _cross_shard_group_norm(
    x, scale, bias, num_groups, eps, *, axis_name, shard_axis, halo,
    padded_extent,
):
    n, c = x.shape[0], x.shape[-1]
    cg = c // num_groups
    e = x.shape[shard_axis]
    if padded_extent % e:
        raise ValueError(
            f"GroupNorm site extent {e} does not divide the halo-padded "
            f"input extent {padded_extent} along shard axis {shard_axis}"
        )
    f = padded_extent // e
    if halo % f:
        raise ValueError(
            f"halo {halo} not divisible by the pooling factor {f} at a "
            f"GroupNorm site — choose a halo divisible by "
            f"2**(num_levels - 1) for cross-shard statistics"
        )
    lh = halo // f
    if e - 2 * lh <= 0:
        raise ValueError(
            f"halo {lh} leaves no interior rows at GroupNorm extent {e}"
        )

    # interior-row mask along the shard axis, broadcast against x
    iota_shape = tuple(e if a == shard_axis else 1 for a in range(x.ndim))
    idx = lax.broadcasted_iota(jnp.int32, iota_shape, shard_axis)
    mask = ((idx >= lh) & (idx < e - lh)).astype(jnp.float32)

    axes = _spatial_axes(x)
    m_local = float(
        np.prod([x.shape[a] for a in axes if a != shard_axis])
        * (e - 2 * lh) * cg
    )
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf * mask, axis=axes)  # (N, C)
    s2 = jnp.sum(jnp.square(xf) * mask, axis=axes)  # (N, C)
    gs1 = jnp.sum(s1.reshape(n, num_groups, cg), axis=-1)
    gs2 = jnp.sum(s2.reshape(n, num_groups, cg), axis=-1)
    gs1 = lax.psum(gs1, axis_name)
    gs2 = lax.psum(gs2, axis_name)
    m = m_local * jax.lax.axis_size(axis_name)
    mean = gs1 / m
    var = jnp.maximum(0.0, gs2 / m - jnp.square(mean))
    inv = lax.rsqrt(var + eps)

    mean_c = _per_channel(mean, cg, x.ndim)
    inv_c = _per_channel(inv, cg, x.ndim)
    y = (xf - mean_c) * inv_c * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int,
    eps: float,
) -> jax.Array:
    """GroupNorm over contiguous channel groups of the trailing axis.

    Output dtype equals ``x.dtype``; statistics and elementwise math are
    float32 regardless.
    """
    y, _ = _gn_fwd(x, scale, bias, num_groups, eps)
    return y


def _gn_fwd(x, scale, bias, num_groups, eps):
    mode = _gn_mode(x)
    if mode == "full":
        return _gn_fwd_pallas(x, scale, bias, num_groups, eps)
    if mode == "hybrid":
        return _gn_fwd_hybrid(x, scale, bias, num_groups, eps)
    cg = x.shape[-1] // num_groups
    mean, inv, _ = _group_stats(x, num_groups, eps)
    mean_c = _per_channel(mean, cg, x.ndim)
    inv_c = _per_channel(inv, cg, x.ndim)
    xf = x.astype(jnp.float32)
    xhat = ((xf - mean_c) * inv_c).astype(x.dtype)
    y = xhat.astype(jnp.float32) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    return y.astype(x.dtype), (xhat, scale, inv)


def _gn_bwd(num_groups, eps, res, g):
    if len(res) == 4:  # pallas/hybrid residual: (x, mean_c, inv_c, scale)
        if _gn_mode(res[0]) == "full":
            return _gn_bwd_pallas(num_groups, eps, res, g)
        return _gn_bwd_hybrid(num_groups, eps, res, g)
    xhat_lp, scale, inv = res
    n, c = xhat_lp.shape[0], xhat_lp.shape[-1]
    cg = c // num_groups
    axes = _spatial_axes(xhat_lp)
    m = float(np.prod([xhat_lp.shape[a] for a in axes]) * cg)

    inv_c = _per_channel(inv, cg, xhat_lp.ndim)
    gf = g.astype(jnp.float32)
    xhat = xhat_lp.astype(jnp.float32)

    # one fused pass over (g, x̂): per-channel sums of g and g·x̂
    c1 = jnp.sum(gf, axis=axes)  # (N, C)
    c2 = jnp.sum(gf * xhat, axis=axes)  # (N, C)

    dbias = jnp.sum(c1, axis=0).astype(scale.dtype)
    dscale = jnp.sum(c2, axis=0).astype(scale.dtype)

    sf = scale.astype(jnp.float32)
    g1 = jnp.sum((c1 * sf).reshape(n, num_groups, cg), axis=-1)  # Σ g·γ
    g2 = jnp.sum((c2 * sf).reshape(n, num_groups, cg), axis=-1)  # Σ g·γ·x̂
    g1_c = _per_channel(g1 / m, cg, xhat_lp.ndim)
    g2_c = _per_channel(g2 / m, cg, xhat_lp.ndim)

    dx = inv_c * (gf * sf - g1_c - xhat * g2_c)
    return dx.astype(xhat_lp.dtype), dscale, dbias


group_norm.defvjp(_gn_fwd, _gn_bwd)


# ---------------------------------------------------------------------------
# Pallas TPU path
# ---------------------------------------------------------------------------
#
# Measured motivation (scripts/tpu_gn_session.py, v5e, UNet3D 'gcr'
# f_maps=32 b2 64×128×128): the XLA-lowered GroupNorm costs 114 ms/step and
# 83 GB of HBM traffic (285 ms 'gcr' vs 171 ms norm-free 'cr'), ~12× the
# ~7 GB that 8 streaming passes over the norm tensors actually need — the
# rest is lane-padding of the non-128 channel counts, fp32 spills, and
# layout copies between reduce fusions and the 3D conv kernels.  These four
# kernels stream each tensor in its own dtype exactly once per pass:
#
#   forward:  stats (x → per-channel Σ, Σ²)  +  affine (y = x·a + b)
#   backward: reduce (g, x → Σg, Σg·x̂)      +  dx (dx = g·A + x·C + D)
#
# with all per-channel coefficient algebra done on tiny (N, C) fp32 arrays
# between kernels.  The residual is (x, mean_c, inv_c): x is the previous
# layer's output and already lives in HBM, so the norm saves nothing
# full-size.
#
# Lane packing: the tensors are streamed as (N, D, H, W·C) — W and C fold
# into the 128-wide lane dimension together, so lane utilization is
# ~perfect for EVERY channel count (C=1 padded alone would inflate blocks
# and HBM tiles up to 128×, which both OOMed VMEM and defeats the traffic
# goal).  Per-channel coefficients are pre-tiled on host to (N, W·C) rows
# (tiny), and per-channel reduction outputs come back as (N, W·C) rows
# that a host-side reshape folds to (N, C).  The 5D→4D reshape is a
# bitcast under the row-major layout pallas already pins.  Grid is
# (N, D, H/bh) with bh a divisor of H fitting the VMEM budget; TPU grid
# steps run sequentially, so the row accumulators are race-free.


def _pl():
    from jax.experimental import pallas as pl  # deferred: TPU-only path

    return pl


def _roundup(v: int, to: int) -> int:
    return -(-v // to) * to


def _pick_bh(h: int, row: int, itemsize: int,
             budget: int = 3 * 2**19) -> Optional[int]:
    """Largest divisor of ``h`` whose (bh, W·C) block fits the VMEM budget
    (~1.5 MB per ref; pallas double-buffers, and the dx kernel holds three
    tensor refs).  Accounts for (8, 128) tile padding.  None if even bh=1
    is too big → caller falls back to the XLA path."""
    padded_row = _roundup(row, 128)
    for bh in sorted((d for d in range(1, h + 1) if h % d == 0), reverse=True):
        # mosaic: last-two block dims must be (divisible by 8, by 128) or
        # equal to the array dims — rows are always full, bh must be 8k or H
        if bh % 8 and bh != h:
            continue
        if _roundup(bh, 8) * padded_row * itemsize <= budget:
            return bh
    return None


def _gn_mode(x: jax.Array) -> str:
    """'full' (all four passes in pallas), 'hybrid' (pallas reductions, XLA
    elementwise), or 'xla' (pure jnp custom-VJP path — the DEFAULT).

    History of the default (same step: UNet3D 'gcr' f_maps=32 b2
    64×128×128 on v5e, one process each):

    - Round 2, native 3D convs: hybrid 238.9 ms / 54.8 GB HBM estimate,
      full 245.5 / 58.3, xla 285.4 / 176.7 → hybrid was the default
      (scripts/tpu_gn_session.py GN_MODES=1).
    - Round 3, slab convs + repeat upsampling: **xla 96.5 ms / 61.4 GB**,
      hybrid 106.0 / 66.3, full 107.0 / 62.3 → xla is now the default.
      With the convs riding the 2D path, XLA fuses the custom-VJP
      normalize/reduce passes into its conv fusions' layouts directly;
      the pallas streaming kernels' (N, D, H, W·C) lane-packed view now
      COSTS ~10 ms of boundary relayouts instead of saving traffic.  The
      custom-VJP algebra (x̂-free residual, fp32 only on (N, C) stats) is
      identical in all three modes — the round-1 flax-GroupNorm fp32
      whole-tensor promotion (~290 ms) is what stays dead.

    Override with TPUSEG_GN_MODE.  TPUSEG_NO_PALLAS_GN=1 is a hard
    kill-switch (same as mode 'xla')."""
    # validate the env knob before any backend/shape early-return so a typo
    # fails fast on every platform (same strictness contract as TPUSEG_CONV3D)
    mode = os.environ.get("TPUSEG_GN_MODE", "xla")
    if mode not in ("full", "hybrid", "xla"):
        raise ValueError(
            f"TPUSEG_GN_MODE={mode!r}: expected 'full', 'hybrid', or 'xla'"
        )
    if os.environ.get("TPUSEG_NO_PALLAS_GN"):
        return "xla"
    if jax.default_backend() != "tpu" or x.ndim != 5:
        return "xla"
    _, d, h, w, c = x.shape
    if _pick_bh(h, w * c, x.dtype.itemsize) is None:
        return "xla"
    return mode


# Row refs ((N, W·C) stats and coefficients) are passed as FULL arrays —
# they are tiny (N ≤ batch, row ≤ ~12K floats) and mosaic's block-shape
# rule (last two dims divisible by (8, 128) or equal to the array's) would
# reject an (1, row) view of them.  Kernels pick their sample row with
# pl.program_id(0) via pl.load/pl.store.


def _row(ref, i):
    return ref[_pl().ds(i, 1), :]  # (1, row) fp32


def _row_add(ref, i, val):
    idx = (_pl().ds(i, 1), slice(None))
    ref[idx] = ref[idx] + val[None]


def _stats_kernel(x_ref, s1_ref, s2_ref):
    pl = _pl()
    i = pl.program_id(0)
    first = (i == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    xf = x_ref[0, 0].astype(jnp.float32)  # (bh, W·C)
    _row_add(s1_ref, i, jnp.sum(xf, axis=0))
    _row_add(s2_ref, i, jnp.sum(xf * xf, axis=0))


def _affine_kernel(x_ref, a_ref, b_ref, y_ref):
    pl = _pl()
    i = pl.program_id(0)
    xf = x_ref[0, 0].astype(jnp.float32)
    y_ref[0, 0] = (xf * _row(a_ref, i) + _row(b_ref, i)).astype(y_ref.dtype)


def _bwd_reduce_kernel(x_ref, g_ref, m_ref, v_ref, c1_ref, c2_ref):
    pl = _pl()
    i = pl.program_id(0)
    first = (i == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first)
    def _():
        c1_ref[...] = jnp.zeros_like(c1_ref)
        c2_ref[...] = jnp.zeros_like(c2_ref)

    xf = x_ref[0, 0].astype(jnp.float32)
    gf = g_ref[0, 0].astype(jnp.float32)
    xhat = (xf - _row(m_ref, i)) * _row(v_ref, i)
    _row_add(c1_ref, i, jnp.sum(gf, axis=0))
    _row_add(c2_ref, i, jnp.sum(gf * xhat, axis=0))


def _bwd_dx_kernel(x_ref, g_ref, a_ref, c_ref, d_ref, dx_ref):
    pl = _pl()
    i = pl.program_id(0)
    xf = x_ref[0, 0].astype(jnp.float32)
    gf = g_ref[0, 0].astype(jnp.float32)
    dx_ref[0, 0] = (
        gf * _row(a_ref, i) + xf * _row(c_ref, i) + _row(d_ref, i)
    ).astype(dx_ref.dtype)


def _gn_grid(x4: jax.Array, n_chan_refs: int, kernel, n_out_rows: int,
             out_full=None, interpret: bool = False):
    """Common pallas_call builder over the lane-packed (N, D, H, W·C) view.

    Tensor refs are blocked (1, 1, bh, W·C) over grid (N, D, H/bh);
    (N, W·C) coefficient-row refs are blocked (1, W·C) pinned to the
    grid's n.  ``n_out_rows`` accumulated (N, W·C) f32 outputs, or one
    full-tensor output of dtype ``out_full``."""
    pl = _pl()
    n, d, h, row = x4.shape
    bh = _pick_bh(h, row, x4.dtype.itemsize)
    tensor_spec = pl.BlockSpec((1, 1, bh, row), lambda i, j, k: (i, j, k, 0))
    row_spec = pl.BlockSpec((n, row), lambda i, j, k: (0, 0))
    n_tensor_refs = 2 if kernel in (_bwd_reduce_kernel, _bwd_dx_kernel) else 1
    in_specs = [tensor_spec] * n_tensor_refs + [row_spec] * n_chan_refs
    if out_full is not None:
        out_specs = tensor_spec
        out_shape = jax.ShapeDtypeStruct(x4.shape, out_full)
    else:
        out_specs = [row_spec] * n_out_rows
        out_shape = [jax.ShapeDtypeStruct((n, row), jnp.float32)] * n_out_rows
    return pl.pallas_call(
        kernel,
        grid=(n, d, h // bh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )


def _expand_groups(stat: jax.Array, cg: int) -> jax.Array:
    """(N, G) fp32 → (N, C) fp32."""
    return jnp.repeat(stat, cg, axis=-1)


def _tile_row(vec_nc: jax.Array, w: int) -> jax.Array:
    """(N, C) → (N, W·C): repeat the channel row across the folded W."""
    n, c = vec_nc.shape
    return jnp.broadcast_to(vec_nc[:, None, :], (n, w, c)).reshape(n, w * c)


def _fold_row(row_nwc: jax.Array, w: int, c: int) -> jax.Array:
    """(N, W·C) reduction rows → (N, C) channel sums."""
    return jnp.sum(row_nwc.reshape(row_nwc.shape[0], w, c), axis=1)


# -- algebra shared by the 'full' and 'hybrid' modes -------------------------
# (the modes differ ONLY in who runs the elementwise passes: pallas kernels
# in 'full', plain XLA broadcasts in 'hybrid'; reductions and coefficient
# math are identical and live here so the modes cannot drift apart)


def _gn_pallas_stats(x4, w, c, num_groups, eps, m, interpret):
    """Pallas streaming reduction → per-channel fp32 (mean_c, inv_c)."""
    n = x4.shape[0]
    cg = c // num_groups
    s1r, s2r = _gn_grid(x4, 0, _stats_kernel, 2, interpret=interpret)(x4)
    s1, s2 = _fold_row(s1r, w, c), _fold_row(s2r, w, c)
    gs1 = jnp.sum(s1.reshape(n, num_groups, cg), axis=-1)
    gs2 = jnp.sum(s2.reshape(n, num_groups, cg), axis=-1)
    mean = gs1 / m
    var = jnp.maximum(0.0, gs2 / m - jnp.square(mean))
    inv = lax.rsqrt(var + eps)
    return _expand_groups(mean, cg), _expand_groups(inv, cg)


def _gn_affine_coeffs(mean_c, inv_c, scale, bias):
    """y = a·x + b coefficients, fp32 (N, C)."""
    a = inv_c * scale.astype(jnp.float32)[None]
    b = bias.astype(jnp.float32)[None] - mean_c * a
    return a, b


def _gn_bwd_reduce(x4, g4, mean_c, inv_c, w, c, interpret):
    """Pallas backward reduction → per-channel (Σg, Σg·x̂) fp32 rows."""
    c1r, c2r = _gn_grid(x4, 2, _bwd_reduce_kernel, 2, interpret=interpret)(
        x4, g4, _tile_row(mean_c, w), _tile_row(inv_c, w)
    )
    return _fold_row(c1r, w, c), _fold_row(c2r, w, c)


def _gn_bwd_coeffs(c1, c2, mean_c, inv_c, scale, num_groups, m):
    """dx = a·g + cc·x + dd coefficients, fp32 (N, C)."""
    n, c = c1.shape
    cg = c // num_groups
    sf = scale.astype(jnp.float32)[None]
    g1 = _expand_groups(
        jnp.sum((c1 * sf).reshape(n, num_groups, cg), axis=-1) / m, cg
    )
    g2 = _expand_groups(
        jnp.sum((c2 * sf).reshape(n, num_groups, cg), axis=-1) / m, cg
    )
    a = inv_c * sf
    cc = -(inv_c * inv_c) * g2
    dd = -inv_c * g1 - mean_c * cc
    return a, cc, dd


def _gn_fwd_pallas(x, scale, bias, num_groups, eps, interpret=False):
    n, d, h, w, c = x.shape
    m = float(d * h * w * (c // num_groups))
    x4 = x.reshape(n, d, h, w * c)
    mean_c, inv_c = _gn_pallas_stats(x4, w, c, num_groups, eps, m, interpret)
    a, b = _gn_affine_coeffs(mean_c, inv_c, scale, bias)
    y4 = _gn_grid(x4, 2, _affine_kernel, 0, out_full=x.dtype,
                  interpret=interpret)(x4, _tile_row(a, w), _tile_row(b, w))
    return y4.reshape(x.shape), (x, mean_c, inv_c, scale)


def _gn_bwd_pallas(num_groups, eps, res, g, interpret=False):
    x, mean_c, inv_c, scale = res
    n, d, h, w, c = x.shape
    m = float(d * h * w * (c // num_groups))
    x4 = x.reshape(n, d, h, w * c)
    g4 = g.reshape(n, d, h, w * c)

    c1, c2 = _gn_bwd_reduce(x4, g4, mean_c, inv_c, w, c, interpret)
    dbias = jnp.sum(c1, axis=0).astype(scale.dtype)
    dscale = jnp.sum(c2, axis=0).astype(scale.dtype)
    a, cc, dd = _gn_bwd_coeffs(c1, c2, mean_c, inv_c, scale, num_groups, m)
    dx4 = _gn_grid(x4, 3, _bwd_dx_kernel, 0, out_full=x.dtype,
                   interpret=interpret)(
        x4, g4, _tile_row(a, w), _tile_row(cc, w), _tile_row(dd, w)
    )
    return dx4.reshape(x.shape), dscale, dbias


# ---------------------------------------------------------------------------
# hybrid mode: pallas reductions + XLA elementwise (see _gn_mode)
# ---------------------------------------------------------------------------


def _bcast(vec_nc: jax.Array, ndim: int) -> jax.Array:
    """(N, C) fp32 → (N, 1, …, 1, C) for XLA-side elementwise broadcast."""
    n, c = vec_nc.shape
    return vec_nc.reshape((n,) + (1,) * (ndim - 2) + (c,))


def _gn_fwd_hybrid(x, scale, bias, num_groups, eps, interpret=False):
    n, d, h, w, c = x.shape
    m = float(d * h * w * (c // num_groups))
    x4 = x.reshape(n, d, h, w * c)
    mean_c, inv_c = _gn_pallas_stats(x4, w, c, num_groups, eps, m, interpret)
    a, b = _gn_affine_coeffs(mean_c, inv_c, scale, bias)
    y = x.astype(jnp.float32) * _bcast(a, x.ndim) + _bcast(b, x.ndim)
    return y.astype(x.dtype), (x, mean_c, inv_c, scale)


def _gn_bwd_hybrid(num_groups, eps, res, g, interpret=False):
    x, mean_c, inv_c, scale = res
    n, d, h, w, c = x.shape
    m = float(d * h * w * (c // num_groups))
    x4 = x.reshape(n, d, h, w * c)
    g4 = g.reshape(n, d, h, w * c)

    c1, c2 = _gn_bwd_reduce(x4, g4, mean_c, inv_c, w, c, interpret)
    dbias = jnp.sum(c1, axis=0).astype(scale.dtype)
    dscale = jnp.sum(c2, axis=0).astype(scale.dtype)
    a, cc, dd = _gn_bwd_coeffs(c1, c2, mean_c, inv_c, scale, num_groups, m)
    dx = (
        g.astype(jnp.float32) * _bcast(a, x.ndim)
        + x.astype(jnp.float32) * _bcast(cc, x.ndim)
        + _bcast(dd, x.ndim)
    )
    return dx.astype(x.dtype), dscale, dbias


class GroupNorm(nn.Module):
    """Drop-in for ``nn.GroupNorm`` (same class name ⇒ same flax param paths
    ``GroupNorm_k/{scale,bias}``; same init) built on the bf16-native
    :func:`group_norm` above.

    ``dtype`` controls the output dtype exactly like flax's
    (canonicalize(x, params, dtype=dtype)); internal full-tensor traffic
    stays in ``x.dtype`` either way.

    DELIBERATE default difference: ``epsilon`` defaults to 1e-5 (torch's
    ``nn.GroupNorm`` default — the parity target, reference
    buildingblocks.py:81-86), not flax's 1e-6.  Pass ``epsilon=1e-6``
    explicitly if flax-default numerics are wanted.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        if c % self.num_groups != 0:
            raise ValueError(
                f"channels {c} not divisible by num_groups {self.num_groups}"
            )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.dtype is None:
            out_dtype = jnp.result_type(x.dtype, scale.dtype, bias.dtype)
        else:
            out_dtype = self.dtype
        if _CROSS_SHARD_CTX is not None:
            y = _cross_shard_group_norm(
                x, scale, bias, self.num_groups, self.epsilon,
                **_CROSS_SHARD_CTX,
            )
        else:
            y = group_norm(x, scale, bias, self.num_groups, self.epsilon)
        from .remat import tag_norm_out

        return tag_norm_out(y.astype(out_dtype))
