"""ops/norm.py GroupNorm vs flax nn.GroupNorm — forward, gradients, dtypes.

The custom implementation must be numerically interchangeable with flax's
(and therefore with torch's, which the UNet3D pixel goldens already pin);
these tests check it directly so a regression points here, not at a model.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdeical_image_segmentation_tpu.ops.norm import GroupNorm, group_norm


def _data(shape=(2, 4, 6, 5, 16), seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * 2.0 + 0.5)


@pytest.mark.parametrize("groups", [1, 4, 16])
@pytest.mark.parametrize("ndim", [4, 5])
def test_forward_matches_flax(groups, ndim):
    shape = (2, 6, 5, 16) if ndim == 4 else (2, 4, 6, 5, 16)
    x = _data(shape)
    rng = np.random.RandomState(1)
    scale = jnp.asarray(rng.randn(16).astype(np.float32))
    bias = jnp.asarray(rng.randn(16).astype(np.float32))
    variables = {"params": {"scale": scale, "bias": bias}}

    ours = GroupNorm(num_groups=groups).apply(variables, x)
    flax_out = nn.GroupNorm(num_groups=groups, epsilon=1e-5).apply(variables, x)
    np.testing.assert_allclose(ours, flax_out, rtol=2e-5, atol=2e-5)


def test_gradients_match_flax():
    x = _data()
    rng = np.random.RandomState(1)
    scale = jnp.asarray(rng.randn(16).astype(np.float32))
    bias = jnp.asarray(rng.randn(16).astype(np.float32))

    def loss_ours(x, s, b):
        y = group_norm(x, s, b, 4, 1e-5)
        return jnp.sum(jnp.sin(y) * jnp.arange(y.size).reshape(y.shape))

    def loss_flax(x, s, b):
        y = nn.GroupNorm(num_groups=4, epsilon=1e-5).apply(
            {"params": {"scale": s, "bias": b}}, x
        )
        return jnp.sum(jnp.sin(y) * jnp.arange(y.size).reshape(y.shape))

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(x, scale, bias)
    g_flax = jax.grad(loss_flax, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_ours, g_flax):
        np.testing.assert_allclose(a, b_, rtol=3e-4, atol=3e-4)


def test_bf16_traffic_dtypes():
    """bf16 in ⇒ bf16 out, bf16 dx — no fp32 full-tensor tangents."""
    x = _data().astype(jnp.bfloat16)
    scale = jnp.ones((16,), jnp.float32)
    bias = jnp.zeros((16,), jnp.float32)

    y = group_norm(x, scale, bias, 4, 1e-5)
    assert y.dtype == jnp.bfloat16

    def loss(x):
        return jnp.sum(group_norm(x, scale, bias, 4, 1e-5).astype(jnp.float32))

    dx = jax.grad(loss)(x)
    assert dx.dtype == jnp.bfloat16

    # bf16 result tracks the fp32 reference within bf16 resolution
    ref = nn.GroupNorm(num_groups=4, epsilon=1e-5).apply(
        {"params": {"scale": scale, "bias": bias}}, x.astype(jnp.float32)
    )
    np.testing.assert_allclose(
        y.astype(np.float32), ref, rtol=2e-2, atol=2e-2
    )


def test_module_param_paths_match_flax():
    """Same auto-name and param tree as nn.GroupNorm ⇒ checkpoints and
    torch_import keep working unchanged."""
    x = _data()
    variables = GroupNorm(num_groups=4).init(jax.random.PRNGKey(0), x)
    assert set(variables["params"].keys()) == {"scale", "bias"}
    assert variables["params"]["scale"].shape == (16,)
    assert GroupNorm.__name__ == "GroupNorm"  # flax auto-names GroupNorm_k


def test_jit_and_remat_compatible():
    x = _data()
    scale = jnp.ones((16,), jnp.float32)
    bias = jnp.zeros((16,), jnp.float32)

    f = jax.jit(lambda x: group_norm(x, scale, bias, 4, 1e-5))
    r = jax.checkpoint(lambda x: jnp.sum(group_norm(x, scale, bias, 4, 1e-5)))
    # jit reassociates the stat reductions — bitwise equality is not expected
    np.testing.assert_allclose(
        f(x), group_norm(x, scale, bias, 4, 1e-5), rtol=1e-4, atol=1e-5
    )
    jax.grad(r)(x)  # remat through the custom VJP must trace


# ---------------------------------------------------------------------------
# Pallas TPU kernels (interpret mode on CPU; jnp path is the oracle)
# ---------------------------------------------------------------------------


def _pallas_case(shape=(2, 4, 8, 16, 12), groups=4, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    scale = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
    return x, scale, bias, groups


@pytest.mark.parametrize("shape,groups", [
    ((2, 4, 8, 16, 12), 4),
    ((1, 3, 5, 16, 8), 8),    # odd D/H, groups == channels
    ((2, 2, 6, 4, 32), 1),    # layer-norm-like single group
])
def test_pallas_forward_matches_jnp(shape, groups):
    from mdeical_image_segmentation_tpu.ops.norm import (
        _gn_fwd, _gn_fwd_pallas)

    x, scale, bias, _ = _pallas_case(shape, groups)
    y_ref, _ = _gn_fwd(x, scale, bias, groups, 1e-5)
    y_pl, res = _gn_fwd_pallas(x, scale, bias, groups, 1e-5, interpret=True)
    np.testing.assert_allclose(y_pl, y_ref, rtol=2e-5, atol=2e-5)
    assert len(res) == 4


def test_pallas_backward_matches_jnp():
    from mdeical_image_segmentation_tpu.ops.norm import (
        _gn_bwd, _gn_bwd_pallas, _gn_fwd, _gn_fwd_pallas)

    x, scale, bias, groups = _pallas_case()
    g = jnp.asarray(
        np.random.RandomState(1).randn(*x.shape).astype(np.float32)
    )
    _, res_ref = _gn_fwd(x, scale, bias, groups, 1e-5)
    dx_ref, ds_ref, db_ref = _gn_bwd(groups, 1e-5, res_ref, g)

    _, res_pl = _gn_fwd_pallas(x, scale, bias, groups, 1e-5, interpret=True)
    dx_pl, ds_pl, db_pl = _gn_bwd_pallas(groups, 1e-5, res_pl, g,
                                         interpret=True)
    np.testing.assert_allclose(dx_pl, dx_ref, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(ds_pl, ds_ref, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(db_pl, db_ref, rtol=3e-4, atol=3e-4)


def test_pallas_bf16_dtypes():
    from mdeical_image_segmentation_tpu.ops.norm import (
        _gn_bwd_pallas, _gn_fwd_pallas)

    x, scale, bias, groups = _pallas_case()
    x = x.astype(jnp.bfloat16)
    y, res = _gn_fwd_pallas(x, scale, bias, groups, 1e-5, interpret=True)
    assert y.dtype == jnp.bfloat16
    dx, ds, db = _gn_bwd_pallas(groups, 1e-5, res,
                                jnp.ones_like(y), interpret=True)
    assert dx.dtype == jnp.bfloat16
    assert ds.dtype == scale.dtype


def test_pick_bh_divides_and_fits():
    from mdeical_image_segmentation_tpu.ops.norm import _pick_bh

    bh = _pick_bh(128, 128 * 96, 4)
    assert bh is not None and 128 % bh == 0
    assert -(-bh // 8) * 8 * 128 * 96 * 4 <= 3 * 2**19
    assert _pick_bh(7, 16 * 8, 4) == 7  # small tensors take one block
    # C=1 full-res case that OOMed the per-C-lane layout now fits
    assert _pick_bh(128, 128 * 1, 4) is not None
    assert _pick_bh(1, 1 << 24, 4) is None  # absurd W*C falls back


def test_hybrid_matches_jnp():
    """Hybrid mode (pallas reductions + XLA elementwise): fwd and bwd match
    the jnp oracle."""
    from mdeical_image_segmentation_tpu.ops.norm import (
        _gn_bwd, _gn_bwd_hybrid, _gn_fwd, _gn_fwd_hybrid)

    x, scale, bias, groups = _pallas_case()
    g = jnp.asarray(
        np.random.RandomState(2).randn(*x.shape).astype(np.float32)
    )
    y_ref, res_ref = _gn_fwd(x, scale, bias, groups, 1e-5)
    dx_ref, ds_ref, db_ref = _gn_bwd(groups, 1e-5, res_ref, g)

    y_h, res_h = _gn_fwd_hybrid(x, scale, bias, groups, 1e-5, interpret=True)
    np.testing.assert_allclose(y_h, y_ref, rtol=2e-5, atol=2e-5)
    dx_h, ds_h, db_h = _gn_bwd_hybrid(groups, 1e-5, res_h, g, interpret=True)
    np.testing.assert_allclose(dx_h, dx_ref, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(ds_h, ds_ref, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(db_h, db_ref, rtol=3e-4, atol=3e-4)
