"""Weight initializers with PyTorch-parity statistics for Flax kernels.

The reference dispatches initializers by module-class-name substring
(model/unet2d/init_weights.py:5-64): Conv/Linear weights get one of
normal(0, 0.02) / xavier-normal / kaiming-normal(fan_in, a=0) / orthogonal,
and norm scales get N(1.0, 0.02) with zero bias.  Modules that never call
``init_weights`` (the classic UNet's DoubleConvolution/UpSample/final_conv,
reference model/unet2d/layers.py:103-168) keep torch's Conv2d default:
kaiming-uniform with a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
both weight and bias.

Flax conv kernels are HWIO (or DHWIO); fan_in = prod(kernel spatial) * I which
matches torch's fan_in for convs, so the same formulas apply directly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.nn.initializers import Initializer


def _fan_in(shape, transpose: bool = False) -> int:
    # Conv kernels (..., I, O): fan_in over all but the last dim.
    # Dense kernels (I, O): same rule.
    # transpose=True: torch ConvTranspose weights are (I, O, *k) and torch's
    # _calculate_fan_in_and_fan_out counts dim 1 — so its "fan_in" is
    # receptive * O, not receptive * I (flax keeps the kernel (..., I, O)
    # either way, so we swap which channel dim counts).
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    return receptive * shape[-1 if transpose else -2]


def _fan_out(shape, transpose: bool = False) -> int:
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    return receptive * shape[-2 if transpose else -1]


def normal_002(transpose: bool = False) -> Initializer:
    """torch ``init.normal_(w, 0.0, 0.02)`` (init_weights 'normal')."""
    del transpose  # fan-free; accepted for a uniform factory signature

    def init(key, shape, dtype=jnp.float32):
        return 0.02 * jax.random.normal(key, shape, dtype)

    return init


def xavier_normal(gain: float = 1.0, transpose: bool = False) -> Initializer:
    """torch ``init.xavier_normal_(w, gain)``: std = gain*sqrt(2/(fan_in+fan_out))."""
    del transpose  # fan_in + fan_out is symmetric under the I/O swap

    def init(key, shape, dtype=jnp.float32):
        std = gain * math.sqrt(2.0 / (_fan_in(shape) + _fan_out(shape)))
        return std * jax.random.normal(key, shape, dtype)

    return init


def kaiming_normal(a: float = 0.0, transpose: bool = False) -> Initializer:
    """torch ``init.kaiming_normal_(w, a=a, mode='fan_in')`` (leaky_relu gain).

    ``transpose=True`` for ConvTranspose kernels, whose torch fan_in is
    ``out_channels * prod(k)`` (weight dim 1 of the (I, O, *k) layout)."""

    def init(key, shape, dtype=jnp.float32):
        gain = math.sqrt(2.0 / (1.0 + a * a))
        std = gain / math.sqrt(_fan_in(shape, transpose))
        return std * jax.random.normal(key, shape, dtype)

    return init


def orthogonal(gain: float = 1.0, transpose: bool = False) -> Initializer:
    """torch ``init.orthogonal_`` parity: orthogonalize the ``w.view(dim0, -1)``
    matrix — (O, fan_in) for convs, (I, O*prod(k)) for transposed convs."""

    def init(key, shape, dtype=jnp.float32):
        if transpose:
            # rows = I (torch dim 0 of (I, O, *k)); cols = O * receptive
            flat = (_fan_in(shape, transpose=True), shape[-2])
            q = jax.nn.initializers.orthogonal(scale=gain, column_axis=-1)(
                key, flat, dtype
            )
            # (cols, I) -> (*k, O, I) -> swap to the flax (*k, I, O) layout
            q = q.reshape(*shape[:-2], shape[-1], shape[-2])
            return jnp.swapaxes(q, -1, -2)
        # torch flattens to (rows=O, cols=fan_in); jax orthogonal over last axis.
        flat = (_fan_in(shape), shape[-1])
        q = jax.nn.initializers.orthogonal(scale=gain, column_axis=-1)(
            key, flat, dtype
        )
        return q.reshape(shape)

    return init


def torch_conv_default_kernel(transpose: bool = False) -> Initializer:
    """torch Conv default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).

    ``transpose=True``: torch ConvTranspose counts fan_in over weight dim 1,
    i.e. ``out_channels * prod(k)`` — sqrt(Cin/Cout) off from the conv rule
    whenever Cin != Cout."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(_fan_in(shape, transpose))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_default_bias(fan_in: int) -> Initializer:
    """torch Conv default bias: U(±1/sqrt(fan_in)) with the *kernel's* fan_in."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def norm_scale_002() -> Initializer:
    """Norm scale ~ N(1.0, 0.02) (init_weights BatchNorm branch)."""

    def init(key, shape, dtype=jnp.float32):
        return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)

    return init


INIT_TYPES = {
    "normal": normal_002,
    "xavier": xavier_normal,
    "kaiming": kaiming_normal,
    "orthogonal": orthogonal,
}


def conv_kernel_init(init_type: str, transpose: bool = False) -> Initializer:
    """Map the reference's ``init_type`` strings to a kernel initializer.

    ``transpose=True`` selects ConvTranspose fan semantics (torch counts
    fan over weight dim 1 = out_channels there)."""
    try:
        return INIT_TYPES[init_type](transpose=transpose)
    except KeyError:
        raise NotImplementedError(
            f"initialization method [{init_type}] is not implemented"
        ) from None
