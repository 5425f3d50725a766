"""Spatial sharding with halo exchange on the 8-device CPU mesh.

Correctness contract verified here: with halo ≥ the model's half receptive
field, every *interior* row (i.e. everything except the volume's outer
edge, where the sharded path uses the reference's mirror-pad convention
instead of the conv zero-pad) matches the monolithic forward exactly.
Weights are amplified after init so activations actually propagate (the
torch-default init otherwise shrinks spatial variation below float
precision, which would make the comparison vacuous)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdeical_image_segmentation_tpu.models import get_model
from mdeical_image_segmentation_tpu.parallel import make_mesh
from mdeical_image_segmentation_tpu.parallel.spatial import spatial_sharded_apply


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


@pytest.fixture(scope="module")
def setup(rng):
    model = get_model(
        {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 4,
         "num_levels": 2, "layer_order": "cr"}
    )
    vol = jnp.asarray(
        np.random.RandomState(0).rand(1, 8, 256, 32, 1), jnp.float32
    )
    variables = model.init(rng, vol[:, :, :32], False)
    # amplify conv kernels so the signal survives 6 conv layers
    variables = jax.tree_util.tree_map(
        lambda x: x * 6.0 if x.ndim == 5 else x, variables
    )
    mono = np.asarray(model.apply(variables, vol, False))
    assert mono.std() > 1.0  # non-vacuous: output varies spatially
    return model, variables, vol, mono


def test_interior_matches_monolithic_exactly(setup, mesh):
    model, variables, vol, mono = setup
    sharded = np.asarray(
        spatial_sharded_apply(model, variables, vol, mesh, halo=16, shard_axis=2)
    )
    # every row except the volume's outer edge (reflect-pad zone) is exact —
    # in particular all 7 shard boundaries (rows 32, 64, ..., 224)
    np.testing.assert_array_equal(sharded[:, :, 12:244], mono[:, :, 12:244])
    row_diff = np.abs(sharded - mono).max(axis=(0, 1, 3, 4))
    assert (row_diff[12:244] == 0).all()


def test_edge_rows_use_mirror_pad_convention(setup, mesh):
    model, variables, vol, mono = setup
    sharded = np.asarray(
        spatial_sharded_apply(model, variables, vol, mesh, halo=16, shard_axis=2)
    )
    # the outer rows intentionally differ (mirror-pad inference convention,
    # reference mirror_pad utils.py:314-342, vs the monolithic conv zero-pad)
    assert np.abs(sharded[:, :, :4] - mono[:, :, :4]).max() > 0


def test_small_halo_breaks_only_boundaries(setup, mesh):
    model, variables, vol, mono = setup
    sharded = np.asarray(
        spatial_sharded_apply(model, variables, vol, mesh, halo=2, shard_axis=2)
    )
    row_diff = np.abs(sharded - mono).max(axis=(0, 1, 3, 4))
    # deep interior of each shard still exact...
    assert row_diff[44:52].max() == 0
    # ...but rows near a shard boundary now differ (halo < receptive field)
    assert row_diff[30:34].max() > 0


def test_indivisible_extent_rejected(setup, mesh):
    model, variables, _, _ = setup
    vol = jnp.zeros((1, 8, 100, 32, 1))
    with pytest.raises(AssertionError, match="not divisible"):
        spatial_sharded_apply(model, variables, vol, mesh, halo=4, shard_axis=2)


def test_oversized_halo_rejected(setup, mesh):
    model, variables, vol, _ = setup
    with pytest.raises(AssertionError, match="halo"):
        spatial_sharded_apply(model, variables, vol, mesh, halo=32, shard_axis=2)


# ---------------------------------------------------------------------------
# spatially-sharded TRAINING (make_spatial_train_step)
# ---------------------------------------------------------------------------


def _emulated_loss(model, vol, labels, n_shards, halo, axis=2):
    """Single-device replica of the sharded objective: split, halo-pad from
    real neighbors (reflect at volume edges), per-shard MSE, mean."""

    def loss_fn(params):
        shards = jnp.split(vol, n_shards, axis=axis)
        y_shards = jnp.split(labels, n_shards, axis=axis)
        losses = []
        for i, s in enumerate(shards):
            if i > 0:
                left = jax.lax.slice_in_dim(
                    shards[i - 1], shards[i - 1].shape[axis] - halo, None, axis=axis
                )
            else:
                left = jnp.flip(jax.lax.slice_in_dim(s, 1, halo + 1, axis=axis), axis)
            if i < n_shards - 1:
                right = jax.lax.slice_in_dim(shards[i + 1], 0, halo, axis=axis)
            else:
                right = jnp.flip(
                    jax.lax.slice_in_dim(s, s.shape[axis] - halo - 1, -1, axis=axis),
                    axis,
                )
            padded = jnp.concatenate([left, s, right], axis=axis)
            out = model.apply({"params": params}, padded, False)
            out = jax.lax.slice_in_dim(out, halo, out.shape[axis] - halo, axis=axis)
            losses.append(jnp.mean(jnp.square(out - y_shards[i])))
        return jnp.mean(jnp.stack(losses))

    return loss_fn


def test_train_step_matches_emulated_reference(mesh):
    """One sharded SGD step == one step of the identical math on one device."""
    import optax

    from mdeical_image_segmentation_tpu.parallel.spatial import (
        make_spatial_train_step)

    model = get_model(
        {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 4,
         "num_levels": 2, "layer_order": "cr"}
    )
    rs = np.random.RandomState(3)
    vol = jnp.asarray(rs.rand(1, 8, 256, 32, 1), jnp.float32)
    labels = jnp.asarray((rs.rand(1, 8, 256, 32, 1) > 0.5), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), vol[:, :, :32], False)["params"]
    params = jax.tree_util.tree_map(
        lambda x: x * 4.0 if x.ndim == 5 else x, params
    )

    opt = optax.sgd(0.05)
    opt_state = opt.init(params)
    criterion = lambda out, y: jnp.mean(jnp.square(out - y))

    step = make_spatial_train_step(
        model, criterion, opt, mesh, halo=16, shard_axis=2, train=False,
        donate=False,
    )
    new_params, _, loss = step(params, opt_state, vol, labels,
                               jax.random.PRNGKey(1))

    n = mesh.shape["data"]
    ref_loss_fn = _emulated_loss(model, vol, labels, n, halo=16)
    ref_loss, ref_grads = jax.value_and_grad(ref_loss_fn)(params)
    updates, _ = opt.update(ref_grads, opt.init(params), params)
    ref_params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-7),
        new_params, ref_params,
    )


def test_train_step_loss_decreases(mesh):
    """E2e: GroupNorm ('gcr') model + BCEDice under spatial sharding trains."""
    import optax

    from mdeical_image_segmentation_tpu.losses import BCEDiceLoss
    from mdeical_image_segmentation_tpu.parallel.spatial import (
        make_spatial_train_step)

    model = get_model(
        {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
         "num_levels": 2, "layer_order": "gcr"}
    )
    rs = np.random.RandomState(0)
    vol = jnp.asarray(rs.rand(1, 8, 128, 32, 1), jnp.float32)
    labels = (vol > 0.5).astype(jnp.float32)
    params = model.init(jax.random.PRNGKey(0), vol[:, :, :16], False)["params"]

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    step = make_spatial_train_step(
        model, BCEDiceLoss(), opt, mesh, halo=4, shard_axis=2
    )
    losses = []
    for i in range(8):
        params, opt_state, loss = step(
            params, opt_state, vol, labels, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def _one_device_mesh():
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:1]), ("data",))


@pytest.fixture(scope="module")
def gcr_setup(rng):
    model = get_model(
        {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
         "num_levels": 2, "layer_order": "gcr"}
    )
    vol = jnp.asarray(
        np.random.RandomState(7).rand(1, 8, 256, 32, 1), jnp.float32
    )
    variables = model.init(rng, vol[:, :, :32], False)
    mono = np.asarray(model.apply(variables, vol, False))
    return model, variables, vol, mono


def test_cross_shard_norm_is_mesh_width_invariant(gcr_setup, mesh):
    """'gcr' + cross_shard_norm: 8 shards == 1 shard (the single-device
    emulation of the same mirror-pad + interior-masked-global-stats math),
    i.e. the psum'd GroupNorm statistics make the result independent of the
    mesh width."""
    model, variables, vol, _ = gcr_setup
    out8 = np.asarray(
        spatial_sharded_apply(model, variables, vol, mesh, halo=16,
                              shard_axis=2, cross_shard_norm=True)
    )
    out1 = np.asarray(
        spatial_sharded_apply(model, variables, vol, _one_device_mesh(),
                              halo=16, shard_axis=2, cross_shard_norm=True)
    )
    np.testing.assert_allclose(out8, out1, rtol=2e-5, atol=2e-6)


@pytest.mark.slow  # opt-in (spatial_cross_shard_norm) path; the default
# tier keeps test_cross_shard_norm_is_mesh_width_invariant as the guard —
# this leg re-derives the same property against a monolithic oracle.
def test_cross_shard_norm_tracks_monolithic_closer_than_per_shard(
    gcr_setup, mesh
):
    """With global statistics the interior matches the plain monolithic
    forward far more closely than per-shard statistics do (the residual gap
    is only the edge rows' mirror-pad values entering the global stats)."""
    model, variables, vol, mono = gcr_setup
    per_shard = np.asarray(
        spatial_sharded_apply(model, variables, vol, mesh, halo=16,
                              shard_axis=2)
    )
    global_stats = np.asarray(
        spatial_sharded_apply(model, variables, vol, mesh, halo=16,
                              shard_axis=2, cross_shard_norm=True)
    )
    interior = (slice(None), slice(None), slice(16, 240))
    err_per_shard = np.abs(per_shard[interior] - mono[interior]).max()
    err_global = np.abs(global_stats[interior] - mono[interior]).max()
    assert err_global < err_per_shard / 5, (err_global, err_per_shard)
    # remaining gap vs the zero-pad monolithic forward is bounded and small
    # (measured max 1.5e-2 at output std ≈ 1): it comes only from the
    # mirror-padded edge rows' values entering the global statistics —
    # the exactness statement itself is the mesh-width invariance above
    np.testing.assert_allclose(
        global_stats[interior], mono[interior], atol=2.5e-2
    )


def test_cross_shard_norm_halo_divisibility_checked(gcr_setup, mesh):
    model, variables, vol, _ = gcr_setup
    with pytest.raises(ValueError, match="divisible by the pooling factor"):
        spatial_sharded_apply(model, variables, vol, mesh, halo=15,
                              shard_axis=2, cross_shard_norm=True)


def test_cross_shard_train_step_matches_one_device(mesh):
    """One sharded 'gcr' train step with psum'd GroupNorm statistics equals
    the identical step on a 1-device mesh (same objective, same forward)."""
    import optax

    from mdeical_image_segmentation_tpu.parallel.spatial import (
        make_spatial_train_step)

    model = get_model(
        {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
         "num_levels": 2, "layer_order": "gcr"}
    )
    rs = np.random.RandomState(11)
    vol = jnp.asarray(rs.rand(1, 8, 256, 32, 1), jnp.float32)
    labels = jnp.asarray((rs.rand(1, 8, 256, 32, 1) > 0.5), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), vol[:, :, :32], False)["params"]
    opt = optax.sgd(0.05)
    criterion = lambda out, y: jnp.mean(jnp.square(out - y))

    results = []
    for m in (mesh, _one_device_mesh()):
        step = make_spatial_train_step(
            model, criterion, opt, m, halo=16, shard_axis=2, train=False,
            donate=False, cross_shard_norm=True,
        )
        new_params, _, loss = step(params, opt.init(params), vol, labels,
                                   jax.random.PRNGKey(1))
        results.append((jax.device_get(new_params), float(loss)))

    (p8, l8), (p1, l1) = results
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=3e-4, atol=1e-6),
        p8, p1,
    )


def test_residual_family_spatial_interior_exact(mesh):
    """Spatial sharding also holds for the ResidualUNet3D family: the
    deconv decoders (slab ConvTranspose3D on TPU, native elsewhere) keep
    the interior bit-exact for a norm-free order ('cr': conv2 'cr', conv3
    'c', post-add relu — no statistics)."""
    model = get_model(
        {"name": "ResidualUNet3D", "in_channels": 1, "out_channels": 1,
         "f_maps": 4, "num_levels": 2, "layer_order": "cr"}
    )
    vol = jnp.asarray(
        np.random.RandomState(5).rand(1, 8, 256, 32, 1), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), vol[:, :, :32], False)
    variables = jax.tree_util.tree_map(
        lambda x: x * 3.0 if x.ndim == 5 else x, variables
    )
    mono = np.asarray(model.apply(variables, vol, False))
    assert np.abs(mono).std() > 1e-3  # non-vacuous
    sharded = np.asarray(
        spatial_sharded_apply(model, variables, vol, mesh, halo=16,
                              shard_axis=2)
    )
    np.testing.assert_array_equal(sharded[:, :, 24:232], mono[:, :, 24:232])


def test_train_step_halo_bounds_checked(mesh):
    import optax

    from mdeical_image_segmentation_tpu.parallel.spatial import (
        make_spatial_train_step)

    model = get_model(
        {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 4,
         "num_levels": 2, "layer_order": "cr"}
    )
    vol = jnp.zeros((1, 8, 64, 32, 1))
    params = model.init(jax.random.PRNGKey(0), vol[:, :, :16], False)["params"]
    opt = optax.sgd(0.1)
    step = make_spatial_train_step(
        model, lambda o, y: jnp.mean(o), opt, mesh, halo=8, shard_axis=2
    )
    with pytest.raises(AssertionError, match="halo"):
        step(params, opt.init(params), vol, vol, jax.random.PRNGKey(0))
