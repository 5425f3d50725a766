"""Overlap-add kernels: XLA and Pallas(interpret) vs a numpy oracle,
validity masking, streaming accumulation, and predictor-path equivalence
(device accumulation == host accumulation)."""

import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdeical_image_segmentation_tpu.ops.overlap import (
    overlap_add,
    overlap_add_into,
    overlap_add_into_pallas,
    overlap_add_into_xla,
)


def _oracle(patches, starts, valid, shape):
    c = patches.shape[-1]
    acc = np.zeros((*shape, c), np.float32)
    cnt = np.zeros_like(acc)
    for i, (z, y, x) in enumerate(np.asarray(starts)):
        if valid[i]:
            pd, ph, pw = patches.shape[1:4]
            acc[z : z + pd, y : y + ph, x : x + pw] += np.asarray(patches[i])
            cnt[z : z + pd, y : y + ph, x : x + pw] += 1
    return acc, cnt


@pytest.fixture(scope="module")
def case():
    rs = np.random.RandomState(0)
    patches = jnp.asarray(rs.rand(6, 4, 8, 8, 2), jnp.float32)
    starts = jnp.asarray(
        [[0, 0, 0], [0, 0, 8], [0, 8, 0], [0, 8, 8], [2, 4, 4], [4, 8, 8]],
        jnp.int32,
    )
    valid = np.array([1, 1, 1, 1, 1, 0], np.float32)  # last patch masked
    return patches, starts, valid


def test_xla_matches_oracle(case):
    patches, starts, valid = case
    acc0 = jnp.zeros((8, 16, 16, 2), jnp.float32)
    cnt0 = jnp.zeros_like(acc0)
    a, c = overlap_add_into_xla(acc0, cnt0, patches, starts, jnp.asarray(valid))
    ea, ec = _oracle(patches, starts, valid, (8, 16, 16))
    np.testing.assert_allclose(np.asarray(a), ea, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c), ec)


def test_pallas_interpret_matches_oracle(case):
    patches, starts, valid = case
    acc0 = jnp.zeros((8, 16, 16, 2), jnp.float32)
    cnt0 = jnp.zeros_like(acc0)
    a, c = overlap_add_into_pallas(
        acc0, cnt0, patches, starts, jnp.asarray(valid), interpret=True
    )
    ea, ec = _oracle(patches, starts, valid, (8, 16, 16))
    np.testing.assert_allclose(np.asarray(a), ea, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c), ec)


def test_streaming_accumulation(case):
    """Two chunked calls equal one combined call."""
    patches, starts, valid = case
    acc = jnp.zeros((8, 16, 16, 2), jnp.float32)
    cnt = jnp.zeros_like(acc)
    acc, cnt = overlap_add_into(acc, cnt, patches[:3], starts[:3], jnp.asarray(valid[:3]))
    acc, cnt = overlap_add_into(acc, cnt, patches[3:], starts[3:], jnp.asarray(valid[3:]))
    ea, ec = _oracle(patches, starts, valid, (8, 16, 16))
    np.testing.assert_allclose(np.asarray(acc), ea, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cnt), ec)


def test_overlap_add_wrapper(case):
    patches, starts, _ = case
    a, c = overlap_add(patches, starts, (8, 16, 16))
    ea, ec = _oracle(patches, starts, np.ones(6), (8, 16, 16))
    np.testing.assert_allclose(np.asarray(a), ea, rtol=1e-6)


def test_predictor_device_vs_host_paths(rng, tmp_path):
    """StandardPredictor device accumulation must equal the host path."""
    import os

    from mdeical_image_segmentation_tpu.data import StandardHDF5Dataset, VolumeLoader
    from mdeical_image_segmentation_tpu.infer import StandardPredictor
    from mdeical_image_segmentation_tpu.models import get_model

    path = str(tmp_path / "vol.h5")
    raw = np.random.RandomState(1).rand(12, 96, 96).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=raw)

    model = get_model(
        {"name": "UNet3D", "in_channels": 1, "out_channels": 2, "f_maps": 8,
         "num_levels": 2}
    )
    variables = model.init(rng, jnp.zeros((1, 4, 64, 64, 1)), False)
    cfg = {"name": "SliceBuilder", "patch_shape": [4, 64, 64],
           "stride_shape": [4, 32, 32], "halo_shape": [0, 0, 0]}
    tf = {"raw": [{"name": "ToTensor", "expand_dims": True}]}

    def run(on_device, out):
        os.makedirs(out)
        ds = StandardHDF5Dataset(path, "test", dict(cfg), tf,
                                 global_normalization=False)
        loader = VolumeLoader(ds, batch_size=4, prefetch=0)
        f = StandardPredictor(model, variables, out, out_channels=2,
                              accumulate_on_device=on_device)(loader)
        with h5py.File(f, "r") as h:
            return h["predictions"][:]

    a = run(True, str(tmp_path / "dev"))
    b = run(False, str(tmp_path / "host"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_overlap_add_bf16_patches_get_f32_maps():
    """bf16 patches must NOT produce bf16 acc/cnt maps: a bf16 count grid
    stops resolving integers past 256 — the exact >255-overlap corruption
    this module exists to prevent (round-3 review finding)."""
    rng = np.random.RandomState(0)
    patches = jnp.asarray(rng.rand(3, 4, 4, 4, 1), jnp.bfloat16)
    starts = jnp.zeros((3, 3), jnp.int32)
    acc, cnt = overlap_add(patches, starts, (8, 8, 8))
    assert acc.dtype == jnp.float32 and cnt.dtype == jnp.float32
    # all three patches hit voxel (0,0,0): the count is exactly 3
    np.testing.assert_allclose(np.asarray(cnt)[0, 0, 0, 0], 3.0)
