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
