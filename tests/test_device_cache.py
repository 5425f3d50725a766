"""HBM-resident 3D train loader (data/device_cache.py): patch coverage
equals the host SliceBuilder grid, the raw/label geometry lock holds on
device, per-patch/global standardize match the host ops, unsupported
pipelines fall back to the host loader, and the 3D trainer trains
end-to-end with ``loaders: {device_cache: true}``."""

import h5py
import jax
import numpy as np
import pytest

from mdeical_image_segmentation_tpu.data.device_cache import (
    DeviceCachedVolumeLoader,
    DeviceCacheUnsupported,
)
from mdeical_image_segmentation_tpu.data.hdf5 import StandardHDF5Dataset
from mdeical_image_segmentation_tpu.data.loaders import get_train_loaders
from mdeical_image_segmentation_tpu.parallel import mesh as mesh_lib

PATCH = [8, 32, 32]


@pytest.fixture(scope="module")
def volume(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("dc") / "train.h5")
    rs = np.random.RandomState(3)
    raw = rs.rand(16, 64, 64).astype(np.float32)
    with h5py.File(p, "w") as f:
        f.create_dataset("raw", data=raw)
        f.create_dataset("label", data=(raw > 0.6).astype(np.uint8))
    return p, raw


def _dataset(path, raw_tf, label_tf, global_normalization=False):
    return StandardHDF5Dataset(
        file_path=path,
        phase="train",
        slice_builder_config={
            "name": "SliceBuilder",
            "patch_shape": PATCH,
            "stride_shape": PATCH,
            "skip_shape_check": True,
        },
        transformer_config={"raw": raw_tf, "label": label_tf},
        global_normalization=global_normalization,
    )


_TT = {"name": "ToTensor", "expand_dims": True}


def _loader(ds, batch=8, **kw):
    return DeviceCachedVolumeLoader(
        [ds], batch_size=batch, mesh=mesh_lib.make_mesh(), seed=0, **kw
    )


def _expected_patches(loader, vol_std):
    """Reconstruct the epoch-0 host-side expectation from the loader's own
    shuffle rule (seed + epoch permutation, same as VolumeLoader)."""
    order = np.random.RandomState(loader.seed + 0).permutation(loader._n)
    out = []
    for i in order[: (loader._n // loader.batch_size) * loader.batch_size]:
        _, z, y, x = loader._coords[i]
        out.append(
            vol_std[z : z + PATCH[0], y : y + PATCH[1], x : x + PATCH[2]]
        )
    return np.stack(out)[..., None]


def test_patches_match_host_per_patch_standardize(volume):
    path, raw = volume
    ds = _dataset(path, [{"name": "Standardize"}, _TT], [_TT])
    loader = _loader(ds)
    assert loader._n == 8 and len(loader) == 1
    got_raw, got_label = [], []
    for r, l, w in loader:
        assert w is None
        got_raw.append(np.asarray(r))
        got_label.append(np.asarray(l))
    got_raw = np.concatenate(got_raw)

    order = np.random.RandomState(0).permutation(8)
    for b, i in enumerate(order):
        _, z, y, x = loader._coords[i]
        patch = raw[z : z + 8, y : y + 32, x : x + 32]
        expect = (patch - patch.mean()) / max(patch.std(), 1e-10)
        np.testing.assert_allclose(
            got_raw[b, ..., 0], expect, rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.concatenate(got_label)[b, ..., 0],
            (patch > 0.6).astype(np.float32),
        )


def test_global_standardize_baked_once(volume):
    path, raw = volume
    ds = _dataset(
        path, [{"name": "Standardize"}, _TT], [_TT], global_normalization=True
    )
    loader = _loader(ds)
    vol_std = (raw - raw.mean()) / max(raw.std(), 1e-10)
    expect = _expected_patches(loader, vol_std)
    got = np.concatenate([np.asarray(r) for r, _, _ in loader])
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_geometry_lock_raw_label(volume):
    """Shared per-patch keys: label geometry tracks raw geometry exactly
    (device analogue of the host pipelines' shared-seed RandomState lock)."""
    path, raw = volume
    p = path.replace("train.h5", "mirror.h5")
    with h5py.File(p, "w") as f:
        f.create_dataset("raw", data=raw)
        f.create_dataset("label", data=raw)  # label IS the raw volume
    geo = [{"name": "RandomFlip", "axis_prob": 0.5}, {"name": "RandomRotate90"}]
    ds = _dataset(p, geo + [_TT], geo + [_TT])
    loader = _loader(ds)
    moved = 0
    order = np.random.RandomState(0).permutation(8)
    for r, l, _ in loader:
        r, l = np.asarray(r), np.asarray(l)
        np.testing.assert_allclose(r, l, rtol=1e-6, atol=1e-6)
        for b, i in enumerate(order):
            _, z, y, x = loader._coords[i]
            if not np.allclose(r[b, ..., 0], raw[z : z + 8, y : y + 32, x : x + 32]):
                moved += 1
    assert moved > 0, "augmentations never fired across a full epoch"


def test_pointwise_raw_augs_run(volume):
    path, _ = volume
    ds = _dataset(
        path,
        [
            {"name": "Standardize"},
            {"name": "RandomContrast", "execution_probability": 1.0},
            {"name": "AdditiveGaussianNoise", "execution_probability": 1.0},
            _TT,
        ],
        [_TT],
    )
    loader = _loader(ds)
    r, l, _ = next(iter(loader))
    assert r.shape == (8, 8, 32, 32, 1) and np.isfinite(np.asarray(r)).all()
    # RandomContrast clips to [-1, 1]; noise is added after
    assert np.asarray(l).shape == r.shape


def test_batch_sharded_over_data_axis(volume):
    path, _ = volume
    ds = _dataset(path, [{"name": "Standardize"}, _TT], [_TT])
    loader = _loader(ds)
    r, _, _ = next(iter(loader))
    spec = r.sharding.spec
    assert spec[0] == mesh_lib.DATA_AXIS


def test_wrap_pad_small_dataset(volume):
    path, _ = volume
    ds = _dataset(path, [{"name": "Standardize"}, _TT], [_TT])
    loader = _loader(ds, batch=16)  # 8 patches < global batch 16
    batches = list(loader)
    assert len(batches) == 1 and len(loader) == 1
    assert batches[0][0].shape[0] == 16


def test_unsupported_pipeline_raises(volume):
    path, _ = volume
    ds = _dataset(
        path,
        [{"name": "ElasticDeformation", "spline_order": 3}, _TT],
        [{"name": "ElasticDeformation", "spline_order": 0}, _TT],
    )
    with pytest.raises(DeviceCacheUnsupported):
        _loader(ds)


def test_rot90_requires_square_hw(volume):
    path, raw = volume
    p = path.replace("train.h5", "rect.h5")
    with h5py.File(p, "w") as f:
        f.create_dataset("raw", data=raw)
        f.create_dataset("label", data=(raw > 0.6).astype(np.uint8))
    ds = StandardHDF5Dataset(
        file_path=p,
        phase="train",
        slice_builder_config={
            "name": "SliceBuilder",
            "patch_shape": [8, 16, 32],
            "stride_shape": [8, 16, 32],
            "skip_shape_check": True,
        },
        transformer_config={
            "raw": [{"name": "RandomRotate90"}, _TT],
            "label": [{"name": "RandomRotate90"}, _TT],
        },
        global_normalization=False,
    )
    with pytest.raises(DeviceCacheUnsupported):
        _loader(ds)


def _trainer_config(train_path, val_path, ckpt, device_cache=True):
    phase = lambda fp: {
        "transformer": {
            "raw": [{"name": "Standardize"}, _TT],
            "label": [_TT],
        },
        "slice_builder": {
            "name": "SliceBuilder",
            "patch_shape": PATCH,
            "stride_shape": PATCH,
            "skip_shape_check": True,
        },
        "file_paths": [fp],
    }
    return {
        "model": {"name": "UNet3D", "in_channels": 1, "out_channels": 1,
                  "f_maps": 8, "num_levels": 2, "final_sigmoid": True},
        "loss": {"name": "BCEDiceLoss"},
        "eval_metric": {"name": "MeanIoU"},
        "optimizer": {"name": "Adam", "learning_rate": 2e-3},
        "trainer": {"checkpoint_dir": ckpt, "max_num_epochs": 4,
                    "max_num_iterations": 50, "validate_after_iters": 3,
                    "log_after_iters": 2},
        "loaders": {"dataset": "StandardHDF5Dataset", "batch_size": 1,
                    "device_cache": device_cache,
                    "train": phase(train_path), "val": phase(val_path)},
    }


def test_trainer3d_device_cache_e2e(volume, tmp_path):
    from mdeical_image_segmentation_tpu.train.trainer3d import create_trainer

    path, raw = volume
    val = str(tmp_path / "val.h5")
    with h5py.File(val, "w") as f:
        f.create_dataset("raw", data=raw[:8])
        f.create_dataset("label", data=(raw[:8] > 0.6).astype(np.uint8))
    trainer = create_trainer(
        _trainer_config(path, val, str(tmp_path / "ckpt"))
    )
    assert isinstance(trainer.loaders["train"], DeviceCachedVolumeLoader)
    trainer.fit()
    # 8 patches / global batch 8 = one step per epoch, 4 epochs
    assert trainer.num_iterations >= 4
    import os

    assert os.path.exists(
        str(tmp_path / "ckpt" / "last_checkpoint.msgpack")
    )


def test_get_train_loaders_fallback_warns(volume, tmp_path):
    path, raw = volume
    val = str(tmp_path / "val2.h5")
    with h5py.File(val, "w") as f:
        f.create_dataset("raw", data=raw[:8])
        f.create_dataset("label", data=(raw[:8] > 0.6).astype(np.uint8))
    cfg = _trainer_config(path, val, str(tmp_path / "ck"))
    cfg["loaders"]["train"]["transformer"]["raw"].insert(
        1, {"name": "ElasticDeformation", "spline_order": 3}
    )
    loaders = get_train_loaders(cfg, n_devices=1, mesh=mesh_lib.make_mesh())
    assert not getattr(loaders["train"], "is_device_cached", False)
