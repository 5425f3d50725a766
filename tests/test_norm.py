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
