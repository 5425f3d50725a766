"""Volumetric data: SliceBuilder tail coverage, filtering, HDF5 datasets
(standard/lazy, train/test phases, halo padding), loaders, stats, mirror pad."""

import os

import h5py
import numpy as np
import pytest

from mdeical_image_segmentation_tpu.data import (
    ConcatDataset,
    FilterSliceBuilder,
    LazyHDF5Dataset,
    SliceBuilder,
    StandardHDF5Dataset,
    VolumeLoader,
    calculate_stats,
    create_padded_indexes,
    get_train_loaders,
    get_test_loaders,
    mirror_pad,
    remove_padding,
    traverse_h5_paths,
)

TRANSFORMER = {
    "raw": [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}],
    "label": [{"name": "ToTensor", "expand_dims": True}],
}
SLICE_CFG = {
    "name": "SliceBuilder",
    "patch_shape": [16, 64, 64],
    "stride_shape": [8, 32, 32],
    "skip_shape_check": False,
}


@pytest.fixture(scope="module")
def h5_file(tmp_path_factory):
    root = tmp_path_factory.mktemp("h5")
    path = str(root / "vol.h5")
    rs = np.random.RandomState(0)
    raw = rs.rand(20, 70, 70).astype(np.float32)
    label = (raw > 0.5).astype(np.uint8)
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=raw)
        f.create_dataset("label", data=label)
    return path


class TestSliceBuilder:
    def test_tail_patch_included(self):
        # size 20, patch 16, stride 8: starts 0, 4 (tail) per _gen_indices
        vol = np.zeros((20, 70, 70))
        sb = SliceBuilder(vol, None, None, [16, 64, 64], [8, 32, 32])
        z_starts = sorted({s[0].start for s in sb.raw_slices})
        assert z_starts == [0, 4]
        y_starts = sorted({s[1].start for s in sb.raw_slices})
        assert y_starts == [0, 6]  # tail 70-64=6

    def test_exact_tiling_no_duplicate_tail(self):
        vol = np.zeros((16, 64, 64))
        sb = SliceBuilder(vol, None, None, [16, 64, 64], [16, 64, 64])
        assert len(sb.raw_slices) == 1

    def test_4d_volume_includes_channel_slice(self):
        vol = np.zeros((2, 16, 64, 64))
        sb = SliceBuilder(vol, None, None, [16, 64, 64], [16, 64, 64])
        assert len(sb.raw_slices[0]) == 4
        assert sb.raw_slices[0][0] == slice(0, 2)

    def test_min_hw_enforced(self):
        with pytest.raises(AssertionError):
            SliceBuilder(np.zeros((16, 32, 32)), None, None, [8, 32, 32], [8, 32, 32])

    def test_skip_shape_check(self):
        SliceBuilder(
            np.zeros((16, 32, 32)), None, None, [8, 32, 32], [8, 32, 32],
            skip_shape_check=True,
        )

    def test_filter_drops_background_patches(self):
        vol = np.zeros((16, 64, 128))
        label = np.zeros((16, 64, 128))
        label[:, :, :64] = 1  # left half fully foreground
        fsb = FilterSliceBuilder(
            vol, label, None, [16, 64, 64], [16, 64, 64], threshold=0.6,
            slack_acceptance=0.0,
        )
        # only the all-foreground left patch survives
        assert len(fsb.raw_slices) == 1
        assert fsb.raw_slices[0][2] == slice(0, 64)


class TestVolumeUtils:
    def test_stats(self):
        x = np.arange(1000, dtype=np.float32)
        s = calculate_stats(x)
        assert s["mean"] == pytest.approx(499.5)
        assert s["pmin"] == pytest.approx(np.percentile(x, 1))

    def test_stats_skip(self):
        s = calculate_stats(None, True)
        assert s["mean"] is None

    def test_mirror_pad_roundtrip(self):
        x = np.random.RandomState(1).rand(8, 10, 12)
        padded = mirror_pad(x, (2, 3, 4))
        assert padded.shape == (12, 16, 20)
        np.testing.assert_array_equal(remove_padding(padded, (2, 3, 4)), x)
        # reflect property at the border
        np.testing.assert_array_equal(padded[1], padded[3])

    def test_mirror_pad_negative_raises(self):
        with pytest.raises(ValueError):
            mirror_pad(np.zeros((4, 4, 4)), (-1, 0, 0))

    def test_padded_indexes(self):
        idx = (slice(0, 16), slice(32, 96), slice(0, 64))
        out = create_padded_indexes(idx, (4, 8, 8))
        assert out == (slice(0, 24), slice(32, 112), slice(0, 80))

    def test_traverse_dirs(self, tmp_path):
        (tmp_path / "a.h5").write_bytes(b"")
        (tmp_path / "b.hdf5").write_bytes(b"")
        (tmp_path / "c.txt").write_bytes(b"")
        found = traverse_h5_paths([str(tmp_path)])
        assert len(found) == 2


class TestHDF5Datasets:
    def test_train_phase_shapes(self, h5_file):
        ds = StandardHDF5Dataset(h5_file, "train", dict(SLICE_CFG), TRANSFORMER)
        raw, label = ds[0]
        assert raw.shape == (16, 64, 64, 1)  # channels-last
        assert label.shape == (16, 64, 64, 1)
        assert raw.dtype == np.float32
        # Standardize applied to raw (near zero mean over volume)
        assert abs(raw.mean()) < 2.0

    def test_test_phase_halo(self, h5_file):
        cfg = dict(SLICE_CFG)
        cfg["halo_shape"] = [2, 4, 4]
        cfg["stride_shape"] = cfg["patch_shape"]
        ds = StandardHDF5Dataset(h5_file, "test", cfg, TRANSFORMER)
        patch, idx = ds[0]
        assert patch.shape == (16 + 4, 64 + 8, 64 + 8, 1)
        assert idx[0] == slice(0, 16)
        assert ds.volume_shape() == (20, 70, 70)

    def test_lazy_matches_standard(self, h5_file):
        std = StandardHDF5Dataset(h5_file, "train", dict(SLICE_CFG), TRANSFORMER)
        lazy = LazyHDF5Dataset(h5_file, "train", dict(SLICE_CFG), TRANSFORMER,
                               global_normalization=True)
        # same seed draw order differs (Transformer seed advances globally),
        # but with deterministic-only transforms outputs must match
        r1, l1 = std[3]
        r2, l2 = lazy[3]
        np.testing.assert_allclose(r1, r2, rtol=1e-6)
        np.testing.assert_array_equal(l1, l2)

    def test_create_datasets_skips_corrupt(self, h5_file, tmp_path):
        bad = str(tmp_path / "bad.h5")
        with open(bad, "wb") as f:
            f.write(b"not an h5 file")
        cfg = {
            "train": {
                "transformer": TRANSFORMER,
                "slice_builder": dict(SLICE_CFG),
                "file_paths": [h5_file, bad],
            }
        }
        datasets = StandardHDF5Dataset.create_datasets(cfg, "train")
        assert len(datasets) == 1  # corrupt file skipped with logged traceback


class TestLoaders:
    def test_train_loaders(self, h5_file, tmp_path):
        # second file for val (disjointness assertion)
        val_file = str(tmp_path / "val.h5")
        rs = np.random.RandomState(2)
        with h5py.File(val_file, "w") as f:
            raw = rs.rand(20, 70, 70).astype(np.float32)
            f.create_dataset("raw", data=raw)
            f.create_dataset("label", (raw > 0.5).astype(np.uint8).shape,
                             data=(raw > 0.5).astype(np.uint8))
        config = {
            "loaders": {
                "dataset": "StandardHDF5Dataset",
                "batch_size": 2,
                "train": {
                    "transformer": TRANSFORMER,
                    "slice_builder": dict(SLICE_CFG),
                    "file_paths": [h5_file],
                },
                "val": {
                    "transformer": TRANSFORMER,
                    "slice_builder": dict(SLICE_CFG),
                    "file_paths": [val_file],
                },
            }
        }
        loaders = get_train_loaders(config, n_devices=2)
        batch = next(iter(loaders["train"]))
        raw, label = batch
        assert raw.shape == (4, 16, 64, 64, 1)  # batch 2 × 2 devices

    def test_overlapping_paths_rejected(self, h5_file):
        config = {
            "loaders": {
                "train": {"file_paths": [h5_file]},
                "val": {"file_paths": [h5_file]},
            }
        }
        with pytest.raises(AssertionError):
            get_train_loaders(config)

    def test_test_loaders(self, h5_file):
        cfg = dict(SLICE_CFG)
        cfg["stride_shape"] = cfg["patch_shape"]
        config = {
            "loaders": {
                "dataset": "StandardHDF5Dataset",
                "batch_size": 2,
                "test": {
                    "transformer": {"raw": TRANSFORMER["raw"]},
                    "slice_builder": cfg,
                    "file_paths": [h5_file],
                },
            }
        }
        loaders = list(get_test_loaders(config))
        assert len(loaders) == 1
        patches, idxs = next(iter(loaders[0]))
        assert patches.shape[0] == 2
        assert isinstance(idxs[0][0], slice)

    def test_concat_dataset(self):
        a = [1, 2, 3]
        b = [4, 5]
        cd = ConcatDataset([a, b])
        assert len(cd) == 5
        assert [cd[i] for i in range(5)] == [1, 2, 3, 4, 5]


class TestRound3ReviewRegressions:
    """Regression coverage for the round-3 high-effort review findings."""

    def test_rgb_to_label_uint8_numpy2(self):
        # numpy 2.x NEP-50: uint8 * 65536 raises OverflowError unless the
        # transform promotes first
        from mdeical_image_segmentation_tpu.transforms.volume import RgbToLabel

        img = np.array([[[1, 2, 3], [255, 255, 255]]], np.uint8)
        out = RgbToLabel()(img)
        assert out.dtype == np.int64
        assert out[0, 0] == 1 * 65536 + 2 * 256 + 3
        assert out[0, 1] == 255 * 65536 + 255 * 256 + 255

    def test_filter_slice_builder_filters_weights_too(self):
        vol = np.zeros((16, 64, 128))
        label = np.zeros((16, 64, 128))
        label[:, :, :64] = 1
        weight = np.ones((16, 64, 128))
        fsb = FilterSliceBuilder(
            vol, label, weight, [16, 64, 64], [16, 64, 64], threshold=0.6,
            slack_acceptance=0.0,
        )
        # the weight stream must be filtered in lockstep (the reference
        # leaves it unfiltered, silently mispairing weights — fixed here)
        assert len(fsb.weight_slices) == len(fsb.raw_slices) == 1
        assert fsb.weight_slices[0] == fsb.raw_slices[0]

    def test_lazy_padded_memo_keyed_on_halo(self, tmp_path):
        import h5py

        from mdeical_image_segmentation_tpu.data.hdf5 import LazyHDF5Dataset

        path = str(tmp_path / "lazy.h5")
        raw = np.random.RandomState(0).rand(16, 64, 64).astype("f4")
        with h5py.File(path, "w") as f:
            f.create_dataset("raw", data=raw)

        def build(halo):
            return LazyHDF5Dataset(
                file_path=path, phase="test",
                slice_builder_config={
                    "name": "SliceBuilder",
                    "patch_shape": [16, 64, 64],
                    "stride_shape": [16, 64, 64],
                    "halo_shape": list(halo),
                },
                transformer_config={
                    "raw": [{"name": "ToTensor", "expand_dims": True}]
                },
            )

        ds_a = build((2, 4, 4))
        patch_a = ds_a[0][0]
        ds_b = build((4, 8, 8))  # different halo, same file
        patch_b = ds_b[0][0]
        # a stale single-key memo returns the SMALLER pad for the second
        # run → truncated patches; the keyed memo yields the right extents
        assert patch_a.shape[:3] == (16 + 4, 64 + 8, 64 + 8)
        assert patch_b.shape[:3] == (16 + 8, 64 + 16, 64 + 16)

    def test_train_val_leak_detected_through_directories(self, tmp_path):
        import h5py

        from mdeical_image_segmentation_tpu.data.loaders import (
            get_train_loaders,
        )

        d = tmp_path / "vols"
        d.mkdir()
        raw = np.random.RandomState(0).rand(16, 64, 64).astype("f4")
        with h5py.File(str(d / "a.h5"), "w") as f:
            f.create_dataset("raw", data=raw)
            f.create_dataset("label", data=(raw > 0.5).astype("f4"))
        cfg = {"loaders": {
            "dataset": "StandardHDF5Dataset",
            "train": {"file_paths": [str(d)],
                      "slice_builder": {"name": "SliceBuilder",
                                        "patch_shape": [16, 64, 64],
                                        "stride_shape": [16, 64, 64]},
                      "transformer": {"raw": [{"name": "ToTensor",
                                               "expand_dims": True}],
                                      "label": [{"name": "ToTensor",
                                                 "expand_dims": True}]}},
            "val": {"file_paths": [str(d / "a.h5")],
                    "slice_builder": {"name": "SliceBuilder",
                                      "patch_shape": [16, 64, 64],
                                      "stride_shape": [16, 64, 64]},
                    "transformer": {"raw": [{"name": "ToTensor",
                                             "expand_dims": True}],
                                    "label": [{"name": "ToTensor",
                                               "expand_dims": True}]}},
        }}
        # the directory expands to the val file — the guard must fire
        with pytest.raises(AssertionError, match="leak"):
            get_train_loaders(cfg)

    def test_volume_loader_abandoned_iterator_unpins_producer(self):
        import threading
        import time

        from mdeical_image_segmentation_tpu.data.loaders import VolumeLoader

        before = threading.active_count()
        ds = [np.ones((2, 2), np.float32) * i for i in range(64)]
        for _ in range(8):
            loader = VolumeLoader(ds, batch_size=2, prefetch=1)
            it = iter(loader)
            next(it)  # single peek, then abandon
            del it
        deadline = time.time() + 10
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.1)
        # producers noticed the abandonment and exited (pre-fix: 8 threads
        # pinned forever on a full queue)
        assert threading.active_count() <= before + 1

    def test_predictor_rejects_unknown_config_keys(self):
        from mdeical_image_segmentation_tpu.infer.predictor import (
            StandardPredictor,
        )

        with pytest.raises(ValueError, match="prediction_channels"):
            StandardPredictor(
                None, None, None, 1, prediction_channels=1  # typo
            )

    def test_gaussian_rescales_integer_images(self):
        from mdeical_image_segmentation_tpu.transforms.skimage_compat import (
            gaussian,
        )

        img = np.full((8, 8), 255, np.uint8)
        out = gaussian(img, sigma=1.0)
        np.testing.assert_allclose(out, 1.0, atol=1e-6)
        # float images keep their range
        imgf = np.full((8, 8), 255.0, np.float32)
        np.testing.assert_allclose(gaussian(imgf, 1.0), 255.0, atol=1e-3)
