"""Slab-decomposed 3D convolution: ride XLA's 2D conv path on TPU.

XLA's native 3D convolutions run far below the MXU efficiency its 2D convs
reach on TPU: the UNet3D microbench (scripts/tpu_conv3d_session.py, v5e)
has the dominant full-resolution 32ch 3×3×3 conv at 13.2 ms fwd / 30.4 ms
fwd+bwd natively vs 7.3 / 15.5 ms when the depth axis is lowered by hand —
a ~2× speedup with identical math (bf16 rel-err 4e-3, pure summation-order
noise).

The lowering: a stride-1 (kd, kh, kw) conv over (N, D, H, W, Ci) equals

    y[:, d] = Σ_k  conv2d(x_pad[:, d + k], W[k])          k = 0..kd-1

with the depth axis folded into the 2D conv's batch — each term is one
(N·D, H, W, Ci) ⊛ (kh, kw, Ci, Co) convolution, which XLA tiles onto the
MXU the same way it tiles the (well-optimized) 2D UNet convs.  Autodiff
through the decomposition yields transposed 2D convs, so the backward gets
the same treatment for free.

Used by :class:`models.layers2d.TorchConv` for rank-3 kernels (parity
target: torch ``nn.Conv3d`` inside the reference's SingleConv,
reference model/unet3d/buildingblocks.py:62-66).  Selection:
``TPUSEG_CONV3D=slab|native|auto`` (auto → slab on TPU, native elsewhere);
strided 3D convs always use the native path.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen import dtypes as flax_dtypes
from jax import lax

_DN2 = lax.conv_dimension_numbers(
    (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
)

_SLAB_VJP_MODES = ("auto", "custom", "autodiff")


def _slab_vjp_mode() -> str:
    """TPUSEG_SLAB_VJP env knob — strict, like TPUSEG_CONV3D.

    Measured NEGATIVE on v5e (scripts/tpu_r3c_session.py, PERF.md): the
    layout-aware custom VJP (fixed-frame kernel-grads) costs more than the
    per-tap saved-slab relayout copies it was built to remove (UNet3D f32
    b2: 104.4 vs 95.4 ms/step) — so 'auto' keeps autodiff and 'custom' is
    opt-in."""
    mode = os.environ.get("TPUSEG_SLAB_VJP", "auto")
    if mode not in _SLAB_VJP_MODES:
        raise ValueError(
            f"TPUSEG_SLAB_VJP={mode!r} not in {_SLAB_VJP_MODES}"
        )
    return mode


def use_slab(kernel_size: Sequence[int], strides: Sequence[int]) -> bool:
    """Whether a 3D conv of this geometry should take the slab path."""
    if len(kernel_size) != 3 or any(s != 1 for s in strides):
        return False
    mode = os.environ.get("TPUSEG_CONV3D", "auto")
    if mode == "native":
        return False
    if mode == "slab":
        return True
    if mode != "auto":
        raise ValueError(
            f"TPUSEG_CONV3D={mode!r}: expected 'slab', 'native', or 'auto'"
        )
    return jax.default_backend() == "tpu"


def _pad_pairs(padding: Any, kernel_size: Tuple[int, ...]):
    """Normalize flax-style padding to one (lo, hi) pair per spatial dim."""
    if isinstance(padding, str):
        p = padding.upper()
        if p == "VALID":
            return [(0, 0)] * len(kernel_size)
        if p == "SAME":
            return [((k - 1) // 2, k // 2) for k in kernel_size]
        raise ValueError(f"unsupported padding {padding!r} for slab conv3d")
    if isinstance(padding, int):
        return [(padding, padding)] * len(kernel_size)
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def slab_conv3d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    padding: Any = "SAME",
    precision: Any = None,
) -> jax.Array:
    """Stride-1 NDHWC ⊛ DHWIO convolution via kd shifted 2D convolutions.

    ``x``: (N, D, H, W, Ci); ``kernel``: (kd, kh, kw, Ci, Co).  Exact (up to
    summation order) match of ``lax.conv_general_dilated`` with the same
    padding; asserts stride-1 by construction.
    """
    (pd, ph, pw) = _pad_pairs(padding, tuple(kernel.shape[:3]))
    if _slab_vjp_mode() == "custom":
        y = _slab_custom_fn((tuple(pd), tuple(ph), tuple(pw)), precision)(
            x, kernel
        )
    else:
        y = _slab_raw(x, kernel, (tuple(pd), tuple(ph), tuple(pw)), precision)
    if bias is not None:
        y = y + bias
    return y


def _slab_raw(x, kernel, pads, precision):
    """The plain shift-input slab loop (autodiff produces per-tap sliced-x
    kernel-grad operands — see :func:`_slab_custom_fn` for why that costs
    layout copies on TPU)."""
    n, d, h, w, ci = x.shape
    kd = kernel.shape[0]
    (pd_lo, pd_hi), ph, pw = pads
    d_out = d + pd_lo + pd_hi - kd + 1
    if pd_lo or pd_hi:
        x = jnp.pad(x, ((0, 0), (pd_lo, pd_hi), (0, 0), (0, 0), (0, 0)))
    y = None
    for k in range(kd):
        xs = lax.slice_in_dim(x, k, k + d_out, axis=1)
        yk = lax.conv_general_dilated(
            xs.reshape(n * d_out, h, w, ci),
            kernel[k],
            window_strides=(1, 1),
            padding=(ph, pw),
            dimension_numbers=_DN2,
            precision=precision,
        )
        y = yk if y is None else y + yk
    return y.reshape(n, d_out, *y.shape[1:])


# kernel-grad dimension numbers: contract over the (N·D) conv batch and the
# output spatial dims; lhs = saved activation slab (B, H, W, Ci) with its
# batch in the contraction ("feature") role, rhs = cotangent slab
# (B, Ho, Wo, Co) as the sliding window, out = (kh, kw, Ci, Co).
_DN_KGRAD = lax.conv_dimension_numbers(
    (1, 1, 1, 1), (1, 1, 1, 1), ("CHWN", "IHWO", "HWNC")
)


@functools.lru_cache(maxsize=64)
def _slab_custom_fn(pads, precision):
    """custom-VJP slab conv (x, kernel) → y with layout-aware grads.

    The TPU profile (PERF.md round 3) showed the dominant remaining
    non-conv cost of the slab decomposition is XLA relaying each of the kd
    *different* depth-sliced copies of the saved input into the kernel-grad
    conv's batch-minor layout — three ~full-tensor copies per conv at the
    big decoder levels.  This VJP restructures the kernel-grad so per-tap
    operands are slices/pads of ONE tensor in ONE layout:

    - dx: ``jax.linear_transpose`` of the forward — autodiff's own form,
      whose per-tap input-grad convs already share the single cotangent
      slab as their operand.
    - dW tap k contracts x_pad[d+k] with g[d]; equivalently (shifting the
      other operand) x_pad[d'] with g[d'-k].  Form A slices x per tap
      (autodiff's form, cheap when Ci is small); form B keeps the full
      x_pad frame fixed and embeds g at depth offset k (cheap when
      Co < Ci, e.g. the 96→32 decoder concat convs).  Selected per conv by
      3·Co < 2·Ci (relayout traffic: A ≈ kd·Ci vs B ≈ Ci + kd·Co).
      Both forms are the same contraction with identical addends (form B's
      extra terms are exact float zeros), evaluated by the same MXU conv.
    """

    @jax.custom_vjp
    def fn(x, kernel):
        return _slab_raw(x, kernel, pads, precision)

    def fwd(x, kernel):
        return fn(x, kernel), (x, kernel)

    def bwd(res, g):
        x, kernel = res
        n, d, h, w, ci = x.shape
        kd, kh, kw, _, co = kernel.shape
        (pd_lo, pd_hi), ph, pw = pads
        d_pad = d + pd_lo + pd_hi
        d_out = d_pad - kd + 1

        dx = jax.linear_transpose(
            lambda xx: _slab_raw(xx, kernel, pads, precision), x
        )(g)[0]

        g_slab = g.reshape(n * d_out, *g.shape[2:])
        if 3 * co < 2 * ci:
            # form B: one fixed x_pad frame; shift g per tap
            x_pad = x
            if pd_lo or pd_hi:
                x_pad = jnp.pad(
                    x, ((0, 0), (pd_lo, pd_hi), (0, 0), (0, 0), (0, 0))
                )
            x_slab = x_pad.reshape(n * d_pad, h, w, ci)
            dk = []
            for k in range(kd):
                gk = jnp.pad(
                    g,
                    ((0, 0), (k, d_pad - d_out - k), (0, 0), (0, 0), (0, 0)),
                ).reshape(n * d_pad, *g.shape[2:])
                dk.append(
                    lax.conv_general_dilated(
                        x_slab, gk,
                        window_strides=(1, 1),
                        padding=(ph, pw),
                        dimension_numbers=_DN_KGRAD,
                        precision=precision,
                    )
                )
        else:
            # form A: slice x per tap (autodiff's form)
            x_pad = x
            if pd_lo or pd_hi:
                x_pad = jnp.pad(
                    x, ((0, 0), (pd_lo, pd_hi), (0, 0), (0, 0), (0, 0))
                )
            dk = []
            for k in range(kd):
                xs = lax.slice_in_dim(x_pad, k, k + d_out, axis=1)
                dk.append(
                    lax.conv_general_dilated(
                        xs.reshape(n * d_out, h, w, ci), g_slab,
                        window_strides=(1, 1),
                        padding=(ph, pw),
                        dimension_numbers=_DN_KGRAD,
                        precision=precision,
                    )
                )
        dkernel = jnp.stack(dk, axis=0)
        return dx, dkernel.astype(kernel.dtype)

    fn.defvjp(fwd, bwd)
    return fn


def use_slab_transpose(kernel_size: Sequence[int], strides: Sequence[int]) -> bool:
    """Whether a 3D *transposed* conv should take the slab path.

    Same env contract as :func:`use_slab` (``TPUSEG_CONV3D``), but applies
    to rank-3 transposed convs with any strides — the ResidualUNet3D
    decoder geometry (k=3, stride 2, torch padding=1; reference
    buildingblocks.py:674-729) lowers natively to an XLA 3D deconv, which
    rides the same ≤9%-of-peak native 3D path the forward convs did before
    the slab decomposition.
    """
    if len(kernel_size) != 3:
        return False
    mode = os.environ.get("TPUSEG_CONV3D", "auto")
    if mode == "native":
        return False
    if mode == "slab":
        return True
    if mode != "auto":
        raise ValueError(
            f"TPUSEG_CONV3D={mode!r}: expected 'slab', 'native', or 'auto'"
        )
    return jax.default_backend() == "tpu"


def _deconv_pads(padding: Any, ks: Tuple[int, ...], strides: Tuple[int, ...]):
    """Per-dim dilated-frame (lo, hi) padding with ``lax.conv_transpose``
    semantics: strings use its SAME/VALID formula; explicit pairs/ints pass
    straight through to ``conv_general_dilated`` (NO k-1-p conversion —
    that is how flax forwards them)."""
    if isinstance(padding, str):
        p = padding.upper()
        out = []
        for k, s in zip(ks, strides):
            if p == "SAME":
                pad_len = k + s - 2
                pa = k - 1 if s > k - 1 else -(-pad_len // 2)
            elif p == "VALID":
                pad_len = k + s - 2 + max(k - s, 0)
                pa = k - 1
            else:
                raise ValueError(
                    f"unsupported padding {padding!r} for slab deconv"
                )
            out.append((pa, pad_len - pa))
        return out
    if isinstance(padding, int):
        return [(padding, padding)] * len(ks)
    return [
        (p, p) if isinstance(p, int) else tuple(p) for p in padding
    ]


def slab_conv_transpose3d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    strides: Tuple[int, int, int],
    padding: Any,
    precision: Any = None,
) -> jax.Array:
    """NDHWC transposed conv via kd per-depth-tap 2D transposed convs.

    Exact (up to summation order) match of ``flax.linen.ConvTranspose``
    (i.e. ``lax.conv_general_dilated`` with ``lhs_dilation=strides`` and
    the unflipped kernel): depth tap ``κ`` of the kernel sends slab ``i``
    of the input to raw output slot ``o = sd·i + (kd-1-κ)`` (raw = the
    fully-padded (kd-1, kd-1) dilated frame), so the raw result
    interleaves ``sd`` phases, each a shifted sum of the per-tap 2D
    results; the requested dilated-frame depth padding is a final
    crop/pad of the raw axis.  Each per-tap 2D transposed conv runs with
    depth folded into the conv batch — the same fold that makes
    :func:`slab_conv3d` ride XLA's fast 2D path.
    """
    n, d, h, w, ci = x.shape
    kd, kh, kw = kernel.shape[:3]
    sd, sh, sw = strides
    (pd_a, pd_b), ph, pw = _deconv_pads(padding, (kd, kh, kw), strides)

    xf = x.reshape(n * d, h, w, ci)
    taps = []
    for k in range(kd):
        taps.append(
            lax.conv_general_dilated(
                xf,
                kernel[k],
                window_strides=(1, 1),
                padding=(ph, pw),
                lhs_dilation=(sh, sw),
                dimension_numbers=_DN2,
                precision=precision,
            )
        )
    ho, wo = taps[0].shape[1], taps[0].shape[2]
    co = kernel.shape[-1]
    taps = [t.reshape(n, d, ho, wo, co) for t in taps]

    raw_depth = (d - 1) * sd + kd
    slots = -(-raw_depth // sd)  # per-phase slot count (ceil)
    phases = []
    for k in range(kd):
        shift = kd - 1 - k  # raw offset this tap lands at
        r = shift % sd
        while len(phases) < sd:
            phases.append(None)
        lead = shift // sd
        t = taps[k]
        if lead or slots != d:
            t = jnp.pad(
                t,
                ((0, 0), (lead, max(slots - d - lead, 0)), (0, 0),
                 (0, 0), (0, 0)),
            )[:, :slots]
        phases[r] = t if phases[r] is None else phases[r] + t
    phases = [
        p if p is not None
        else jnp.zeros((n, slots, ho, wo, co), taps[0].dtype)
        for p in phases
    ]

    y = jnp.stack(phases, axis=2)  # (N, slots, sd, Ho, Wo, C)
    y = y.reshape(n, slots * sd, ho, wo, co)[:, :raw_depth]
    # raw frame has (kd-1, kd-1) dilated padding; adjust to the requested
    # (pd_a, pd_b): crop when under, zero-pad when over (strides > kernel)
    lo, hi = (kd - 1) - pd_a, (kd - 1) - pd_b
    if lo < 0 or hi < 0:
        y = jnp.pad(
            y,
            ((0, 0), (max(-lo, 0), max(-hi, 0)), (0, 0), (0, 0), (0, 0)),
        )
        lo, hi = max(lo, 0), max(hi, 0)
    return y[:, lo:y.shape[1] - hi if hi else None]


class SlabConvTranspose3D(nn.Module):
    """Param-tree-compatible stand-in for ``nn.ConvTranspose`` (rank-3).

    Same ``kernel`` param (shape ``(kd, kh, kw, Ci, Co)``, same name/init)
    as the ``nn.ConvTranspose`` it replaces, so checkpoints and
    torch-parity imports are unaffected; only the lowering differs.
    """

    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (2, 2, 2)
    padding: Any = "SAME"
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ci = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, tuple(self.kernel_size) + (ci, self.features)
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )
        x, kernel, bias = flax_dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        y = slab_conv_transpose3d(
            x, kernel, strides=tuple(self.strides), padding=self.padding
        )
        if bias is not None:
            y = y + bias
        return y


class SlabConv3D(nn.Module):
    """Param-tree-compatible stand-in for ``nn.Conv`` with a rank-3 kernel.

    Creates the same ``kernel``/``bias`` params (same shapes, names, inits)
    as the ``nn.Conv`` it replaces, so checkpoints and torch-parity imports
    are unaffected; only the lowering differs.
    """

    features: int
    kernel_size: Tuple[int, int, int]
    padding: Any = "SAME"
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ci = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, tuple(self.kernel_size) + (ci, self.features)
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )
        x, kernel, bias = flax_dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        return slab_conv3d(x, kernel, bias, padding=self.padding)
