"""Tests for the int8 PTQ inference path (ops/quant.py).

The reference has no quantized path — this is a TPU extension (v5e int8
MXU at 2x bf16 peak; measured conv speedups in PERF.md).  Correctness is
pinned on the CPU mesh: exact s8 conv math vs a hand-dequantized oracle,
calibration bookkeeping, param-tree compatibility with float checkpoints,
and end-to-end output fidelity on the real model families.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdeical_image_segmentation_tpu.ops import quant


def _unet2d(base=16, in_ch=1):
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel

    return UNetModel(
        UNetConfig(
            in_channels=in_ch, out_channels=1, unet_type="UNet",
            base_features=base,
        )
    )


def test_mode_context_restores():
    assert quant.mode() == "off"
    with quant.quant_mode("calib"):
        assert quant.mode() == "calib"
        with quant.quant_mode("int8"):
            assert quant.mode() == "int8"
        assert quant.mode() == "calib"
    assert quant.mode() == "off"
    with pytest.raises(ValueError):
        with quant.quant_mode("int7"):
            pass


def test_weight_quant_per_channel_exact():
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(3, 3, 8, 4), jnp.float32)
    w_q, w_s = quant._weight_quant(k)
    assert w_q.dtype == jnp.int8 and w_s.shape == (4,)
    # per-channel absmax maps to ±127 exactly
    assert int(jnp.abs(w_q).max()) == 127
    deq = w_q.astype(jnp.float32) * w_s
    assert float(jnp.abs(deq - k).max()) <= float(w_s.max()) / 2 + 1e-7


def test_int8_conv_matches_dequantized_oracle():
    """The s8 conv must equal the float conv over the dequantized operands
    bit-for-bit (int32 accumulation is exact)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 10, 12, 8), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 16) * 0.3, jnp.float32)
    x_scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    x_q = quant._act_quant(x, x_scale)
    w_q, w_s = quant._weight_quant(k)
    y32 = quant._int8_conv_nd(x_q, w_q, (1, 1), "SAME", 2)
    # oracle: float conv on the dequantized int values
    oracle = jax.lax.conv_general_dilated(
        x_q.astype(jnp.float32), w_q.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        ),
    )
    np.testing.assert_array_equal(np.asarray(y32), np.asarray(oracle))


def test_int8_slab_conv3d_matches_native_int8():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randint(-127, 128, (1, 6, 8, 8, 8)), jnp.int8)
    w = jnp.asarray(rng.randint(-127, 128, (3, 3, 3, 8, 8)), jnp.int8)
    slab = quant._int8_slab_conv3d(x, w, (((1, 1)), (1, 1), (1, 1)))
    native = quant._int8_conv_nd(x, w, (1, 1, 1), "SAME", 3)
    np.testing.assert_array_equal(np.asarray(slab), np.asarray(native))


def test_calibrate_running_absmax_over_batches():
    model = _unet2d(base=16)
    rng = np.random.RandomState(3)
    x1 = jnp.asarray(rng.rand(1, 32, 32, 1), jnp.float32)
    x2 = jnp.asarray(rng.rand(1, 32, 32, 1) * 3.0, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1)

    def apply_fn(v, xx, **kw):
        return model.apply(v, xx, None, train=False, **kw)

    s_one = quant.calibrate(apply_fn, variables, [(x1,)])
    s_two = quant.calibrate(apply_fn, variables, [(x1,), (x2,)])
    leaves_one = jax.tree_util.tree_leaves(s_one)
    leaves_two = jax.tree_util.tree_leaves(s_two)
    assert len(leaves_one) == len(leaves_two) > 0
    # absmax is a running max: the two-batch pass can only be >=
    for a, b in zip(leaves_one, leaves_two):
        assert float(b) >= float(a) - 1e-7


def test_calibrate_requires_batches():
    model = _unet2d(base=16)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError):
        quant.calibrate(
            lambda v, xx, **kw: model.apply(v, xx, None, train=False, **kw),
            variables, [],
        )


def test_int8_without_calibration_raises():
    model = _unet2d(base=16)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="calibrat"):
        quant.wrap_apply(
            lambda v, xx: model.apply(v, xx, None, train=False), "int8"
        )(variables, x)


def test_unet2d_int8_output_close_and_params_unchanged():
    """End-to-end: same float variables drive both paths; int8 logits track
    the float logits and threshold masks mostly agree."""
    model = _unet2d(base=16)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def fwd(v, xx):
        return model.apply(v, xx, None, train=False).logits

    ref = np.asarray(fwd(variables, x))
    scales = quant.calibrate(
        lambda v, xx, **kw: model.apply(v, xx, None, train=False, **kw),
        variables, [(x,)],
    )
    q = np.asarray(quant.wrap_apply(fwd, "int8")({**variables, **scales}, x))
    assert q.shape == ref.shape
    rel = np.abs(q - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.15, rel
    assert ((ref > 0) == (q > 0)).mean() > 0.98


def test_unet3d_int8_output_close():
    from mdeical_image_segmentation_tpu.models import get_model

    model = get_model(
        {"name": "UNet3D", "in_channels": 1, "out_channels": 1,
         "f_maps": 16, "num_levels": 3, "layer_order": "gcr"}
    )
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(1, 16, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def fwd(v, xx):
        return model.apply(v, xx, False)

    ref = np.asarray(fwd(variables, x))
    scales = quant.calibrate(
        lambda v, xx, **kw: model.apply(v, xx, False, **kw),
        variables, [(x,)],
    )
    q = np.asarray(quant.wrap_apply(fwd, "int8")({**variables, **scales}, x))
    rel = np.abs(q - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.15, rel
    # random-init logits hover near zero, so threshold agreement is noisy;
    # the trained-model fidelity bar lives in the TPU measurement (PERF.md)
    assert ((ref > 0) == (q > 0)).mean() > 0.95


def test_stem_conv_stays_float():
    """Ci=1 stem convs are below MIN_QUANT_CIN and must not collect scales."""
    model = _unet2d(base=16, in_ch=1)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    scales = quant.calibrate(
        lambda v, xx, **kw: model.apply(v, xx, None, train=False, **kw),
        variables, [(x,)],
    )
    from flax import traverse_util

    flat = traverse_util.flatten_dict(scales["quant"], sep="/")
    # the very first conv consumes the 1-channel input; its path must be
    # absent while later (>=16 channel) convs are present
    n_params_convs = sum(
        1 for p in traverse_util.flatten_dict(
            variables["params"], sep="/"
        ) if p.endswith("Conv_0/kernel")
    )
    assert 0 < len(flat) < n_params_convs


def test_calib_mode_forward_matches_off_mode():
    model = _unet2d(base=16)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(1, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def fwd(v, xx, **kw):
        return model.apply(v, xx, None, train=False, **kw)

    ref = np.asarray(fwd(variables, x).logits)
    out, _ = quant.wrap_apply(fwd, "calib")(variables, x, mutable=["quant"])
    np.testing.assert_allclose(np.asarray(out.logits), ref, atol=1e-5, rtol=1e-5)
