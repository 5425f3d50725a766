"""Post-training int8 quantization (W8A8) for the conv inference path.

TPU-native rationale: the v5e MXU runs s8xs8->s32 contractions at 2x the
bf16 peak, and XLA lowers ``lax.conv_general_dilated`` on int8 operands to
a native s32-accumulating convolution (verified in the optimized HLO —
scripts/tpu_int8_probe.py).  Measured on the dominant shapes of this
framework (one v5e, chained-scan timing):

* 2D UNet level-1 conv (32,256,256,64)x(3,3,64,64): 4.59 -> 2.79 ms (1.64x)
* 2D level-2 (32,128,128,128)x(3,3,128,128):        2.22 -> 1.35 ms (1.64x)
* slab-form 3D f_maps=64 (64,128,128,64):           3.16 -> 1.83 ms (1.73x)

End-to-end forwards (scripts/tpu_int8_e2e.py): UNet2D base64 b32 1.42x,
UNet3D f_maps=32 b2 1.70x — but f_maps=64 b1 measured 0.76x (int8 layout
relayouts + quant passes outweigh the conv win at that width/batch;
profile in PERF.md).  Quantization is therefore per-config opt-in, not a
default.

The reference framework (a-green-hand-jack/mdeical_image_segmentation) has
no quantized path; this is a TPU extension for the inference/serving side
only — training stays bf16-compute/fp32-params.

Scheme (standard conv-only W8A8 PTQ):

* weights: symmetric per-output-channel int8, scales derived from the
  loaded fp32 kernel at trace time (cheap relative to the conv);
* activations: symmetric per-tensor int8 with STATIC scales collected by a
  calibration pass (running absmax over calibration batches, stored in a
  ``quant`` flax variable collection keyed by module path);
* accumulation in int32, rescale + bias in fp32, output cast back to the
  model compute dtype.  Norms/activations/pools/transposed convs stay
  float; convs with fewer than ``MIN_QUANT_CIN`` input channels (e.g. the
  Ci=1 stem conv) also stay float — they carry negligible FLOPs and the
  raw-input dynamic range is the widest in the net.

Usage::

    scales = calibrate(model.apply, variables, batches)   # "quant" coll.
    y = wrap_apply(model.apply, "int8")({**variables, **scales}, x, False)

Modes ride a contextvar read at *trace* time — wrap the traced callable
(``wrap_apply``) rather than the call site so jit caching stays correct.
"""

import contextlib
import contextvars
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen import dtypes as flax_dtypes
from jax import lax

from . import conv3d as _conv3d

MODES = ("off", "calib", "int8")

#: convs with Ci below this stay float (stem convs: negligible FLOPs,
#: widest dynamic range).
MIN_QUANT_CIN = 8

_mode_var: contextvars.ContextVar = contextvars.ContextVar(
    "tpuseg_quant_mode", default="off"
)


def mode() -> str:
    """Current quantization mode ('off' | 'calib' | 'int8')."""
    return _mode_var.get()


@contextlib.contextmanager
def quant_mode(m: str):
    if m not in MODES:
        raise ValueError(f"quant mode {m!r} not in {MODES}")
    token = _mode_var.set(m)
    try:
        yield
    finally:
        _mode_var.reset(token)


def wrap_apply(fn: Callable, m: str) -> Callable:
    """Return ``fn`` running under quant mode ``m``.

    The context is entered inside the wrapper body, so it is active during
    jit tracing of the wrapper — this is the supported way to jit a
    quantized forward."""

    def wrapped(*args, **kwargs):
        with quant_mode(m):
            return fn(*args, **kwargs)

    return wrapped


def quantizable(kernel_size: Sequence[int], in_channels: int) -> bool:
    """Whether TorchConv routes this conv through the int8 stand-in."""
    return len(kernel_size) in (2, 3) and in_channels >= MIN_QUANT_CIN


def _act_quant(x: jax.Array, scale: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32) / scale
    return jnp.clip(jnp.round(x32), -127.0, 127.0).astype(jnp.int8)


def _weight_quant(kernel: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: returns (w_q, w_scale[Co])."""
    k32 = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(k32), axis=tuple(range(k32.ndim - 1)))
    w_scale = jnp.maximum(absmax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(k32 / w_scale), -127.0, 127.0).astype(jnp.int8)
    return w_q, w_scale


def _conv_padding(padding: Any, kernel_size: Tuple[int, ...]):
    if isinstance(padding, str):
        return padding.upper()
    return [tuple(p) for p in _conv3d._pad_pairs(padding, kernel_size)]


def _int8_conv_nd(x_q, w_q, strides, padding, ndim_spatial):
    spec = "NHWC" if ndim_spatial == 2 else "NDHWC"
    kspec = "HWIO" if ndim_spatial == 2 else "DHWIO"
    dn = lax.conv_dimension_numbers(x_q.shape, w_q.shape, (spec, kspec, spec))
    return lax.conv_general_dilated(
        x_q, w_q, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )


def _int8_slab_conv3d(x_q, w_q, pads):
    """Stride-1 depth-axis slab lowering in int8 (mirrors conv3d._slab_raw:
    the same Σ_k conv2d over (N·D) folded slabs, s32 accumulation)."""
    n, d, h, w, ci = x_q.shape
    kd = w_q.shape[0]
    (pd_lo, pd_hi), ph, pw = pads
    d_out = d + pd_lo + pd_hi - kd + 1
    if pd_lo or pd_hi:
        x_q = jnp.pad(x_q, ((0, 0), (pd_lo, pd_hi), (0, 0), (0, 0), (0, 0)))
    y = None
    for k in range(kd):
        xs = lax.slice_in_dim(x_q, k, k + d_out, axis=1)
        yk = lax.conv_general_dilated(
            xs.reshape(n * d_out, h, w, ci),
            w_q[k],
            window_strides=(1, 1),
            padding=(tuple(ph), tuple(pw)),
            dimension_numbers=_conv3d._DN2,
            preferred_element_type=jnp.int32,
        )
        y = yk if y is None else y + yk
    return y.reshape(n, d_out, *y.shape[1:])


class Int8Conv(nn.Module):
    """Param-tree-compatible int8 stand-in for ``nn.Conv`` / ``SlabConv3D``.

    Creates the same ``kernel``/``bias`` params (shapes, names, inits) as
    the float conv it replaces, so checkpoints load unchanged.  In 'calib'
    mode it runs the float conv and records the input absmax into the
    ``quant`` collection; in 'int8' mode it reads the recorded absmax and
    runs the s8xs8->s32 conv.
    """

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Any = "SAME"
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks = tuple(self.kernel_size)
        ci = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, ks + (ci, self.features))
        bias = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )
        qmode = mode()
        if qmode == "calib":
            absmax = self.variable(
                "quant", "x_absmax", lambda: jnp.zeros((), jnp.float32)
            )
            if self.is_mutable_collection("quant"):
                absmax.value = jnp.maximum(
                    absmax.value, jnp.max(jnp.abs(x)).astype(jnp.float32)
                )
            return self._float_conv(x, kernel, bias)
        if qmode != "int8":
            return self._float_conv(x, kernel, bias)

        if not self.has_variable("quant", "x_absmax"):
            raise ValueError(
                "int8 inference requires calibrated activation scales: run "
                "ops.quant.calibrate(...) and pass its 'quant' collection "
                f"in the variables dict (missing at {self.scope.path})"
            )
        absmax = self.get_variable("quant", "x_absmax")
        x_scale = jnp.maximum(absmax.astype(jnp.float32), 1e-12) / 127.0
        x_q = _act_quant(x, x_scale)
        w_q, w_scale = _weight_quant(kernel)
        if len(ks) == 3 and _conv3d.use_slab(ks, self.strides):
            pads = _conv3d._pad_pairs(self.padding, ks)
            y32 = _int8_slab_conv3d(
                x_q, w_q, (tuple(pads[0]), tuple(pads[1]), tuple(pads[2]))
            )
        else:
            y32 = _int8_conv_nd(
                x_q, w_q, self.strides, _conv_padding(self.padding, ks),
                len(ks),
            )
        y = y32.astype(jnp.float32) * (x_scale * w_scale)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        out_dtype = flax_dtypes.canonicalize_dtype(x, kernel, dtype=self.dtype)
        return y.astype(out_dtype)

    def _float_conv(self, x, kernel, bias):
        """Float fallback with identical numerics to the nn.Conv path."""
        x, kernel, bias = flax_dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        ks = tuple(self.kernel_size)
        if len(ks) == 3 and _conv3d.use_slab(ks, self.strides):
            return _conv3d.slab_conv3d(x, kernel, bias, padding=self.padding)
        y = lax.conv_general_dilated(
            x, kernel, self.strides, _conv_padding(self.padding, ks),
            dimension_numbers=lax.conv_dimension_numbers(
                x.shape, kernel.shape,
                ("NHWC", "HWIO", "NHWC") if len(ks) == 2
                else ("NDHWC", "DHWIO", "NDHWC"),
            ),
        )
        if bias is not None:
            y = y + bias
        return y


def calibrate(apply_fn: Callable, variables, batches, **apply_kwargs):
    """Run calibration forwards; returns ``{"quant": <scales tree>}``.

    ``batches`` is an iterable of positional-arg tuples for ``apply_fn``
    (each already device-ready); absmax accumulates across all batches.
    """
    calib_fn = wrap_apply(apply_fn, "calib")
    quant = {}
    for args in batches:
        if not isinstance(args, tuple):
            args = (args,)
        _, upd = calib_fn(
            {**variables, "quant": quant}, *args,
            mutable=["quant"], **apply_kwargs,
        )
        quant = upd["quant"]
    if not quant:
        raise ValueError("calibration saw no quantizable convs or no batches")
    return {"quant": quant}
