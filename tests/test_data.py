"""Data pipeline: seed-42 split parity, collator contract, loader shapes,
device augmentation geometry-lock, nearest-resize parity."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from mdeical_image_segmentation_tpu.data import (
    BatchLoader,
    DRIVEDataset,
    SliceCollator,
    SyntheticSliceDataset,
    nearest_resize,
)
from mdeical_image_segmentation_tpu.transforms import augment_batch


@pytest.fixture(scope="module")
def drive_dir(tmp_path_factory):
    """Synthesize a DRIVE-layout dataset: 20 png image/label pairs."""
    root = tmp_path_factory.mktemp("drive")
    os.makedirs(root / "images")
    os.makedirs(root / "labels")
    rs = np.random.RandomState(0)
    for i in range(20):
        img = (rs.rand(40, 50, 3) * 255).astype(np.uint8)
        lab = ((rs.rand(40, 50) > 0.5) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"{i:02d}.png")
        Image.fromarray(lab).save(root / "labels" / f"{i:02d}.png")
    return str(root)


class TestSplit:
    def test_split_sizes_70_20_10(self, drive_dir):
        tr = DRIVEDataset(drive_dir, mode="train", resolution=64)
        ev = DRIVEDataset(drive_dir, mode="eval", resolution=64)
        te = DRIVEDataset(drive_dir, mode="test", resolution=64)
        # Reference parity quirk: test_size = 1 - 0.7 = 0.30000000000000004,
        # so sklearn ceils to 7 held-out samples → 13/4/3 (not 14/4/2).
        assert len(tr) == 13 and len(ev) == 4 and len(te) == 3

    def test_split_matches_sklearn_seed42(self, drive_dir):
        # parity with the reference's two-stage train_test_split(seed=42)
        from glob import glob
        from sklearn.model_selection import train_test_split

        images = sorted(glob(os.path.join(drive_dir, "images", "*")))
        labels = sorted(glob(os.path.join(drive_dir, "labels", "*")))
        # same float expression as the reference (1 - train_ratio)
        tr_i, tmp_i, _, _ = train_test_split(
            images, labels, test_size=(1 - 0.7), random_state=42
        )
        ds = DRIVEDataset(drive_dir, mode="train", resolution=64)
        assert ds.images_path == tr_i

    def test_disjoint_and_exhaustive(self, drive_dir):
        splits = [
            set(DRIVEDataset(drive_dir, mode=m, resolution=64).images_path)
            for m in ("train", "eval", "test")
        ]
        assert not (splits[0] & splits[1]) and not (splits[0] & splits[2])
        assert len(splits[0] | splits[1] | splits[2]) == 20

    def test_bad_mode_raises(self, drive_dir):
        with pytest.raises(ValueError):
            DRIVEDataset(drive_dir, mode="predict")


class TestSamplesAndCollation:
    def test_sample_contract(self, drive_dir):
        ds = DRIVEDataset(drive_dir, mode="train", resolution=64)
        s = ds[0]
        assert s["image"].shape == (64, 64, 3)
        assert s["mask"].shape == (64, 64, 1)
        assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0

    def test_collator_keys(self, drive_dir):
        ds = DRIVEDataset(drive_dir, mode="eval", resolution=32)
        batch = SliceCollator()([ds[0], ds[1]])
        assert set(batch) == {"images", "labels"}
        assert batch["images"].shape == (2, 32, 32, 3)
        assert batch["labels"].shape == (2, 32, 32, 1)

    def test_loader_drop_last_and_padding(self):
        ds = SyntheticSliceDataset(n_samples=10, resolution=16)
        train = list(BatchLoader(ds, 4, shuffle=True, prefetch=0))
        assert len(train) == 2  # drop_last
        ev = list(BatchLoader(ds, 4, shuffle=False, prefetch=0))
        assert len(ev) == 3  # padded tail
        assert all(b["images"].shape[0] == 4 for b in ev)

    def test_prefetch_thread_equivalent(self):
        ds = SyntheticSliceDataset(n_samples=8, resolution=16)
        a = list(BatchLoader(ds, 4, prefetch=0))
        b = list(BatchLoader(ds, 4, prefetch=2))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["images"], y["images"])


class TestNearestResize:
    def test_matches_index_rule(self):
        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        out = nearest_resize(img, (6, 8))
        # src index = floor(dst * in/out)
        for i in range(6):
            for j in range(8):
                assert out[i, j] == img[i * 3 // 6, j * 4 // 8]


class TestDeviceAugment:
    def test_geometry_lock(self, rng):
        """Raw and mask must receive identical random geometry."""
        imgs = jnp.asarray(np.random.RandomState(0).rand(8, 32, 32, 1), jnp.float32)
        # mask = exact copy of the image → after aug (geometry-only part),
        # thresholded mask must still equal thresholded image
        masks = (imgs > 0.5).astype(jnp.float32)
        from mdeical_image_segmentation_tpu.transforms import Augment2DConfig

        cfg = Augment2DConfig(p_brightness_contrast=0.0)  # geometry only
        ai, am = augment_batch(rng, imgs, masks, cfg)
        np.testing.assert_array_equal(
            np.asarray(ai > 0.5).astype(np.float32), np.asarray(am)
        )

    def test_augment_changes_something(self, rng):
        imgs = jnp.asarray(np.random.RandomState(1).rand(8, 32, 32, 1), jnp.float32)
        masks = (imgs > 0.5).astype(jnp.float32)
        ai, _ = augment_batch(rng, imgs, masks)
        assert not np.allclose(np.asarray(ai), np.asarray(imgs))

    def test_deterministic_given_key(self, rng):
        imgs = jnp.asarray(np.random.RandomState(2).rand(4, 16, 16, 1), jnp.float32)
        masks = (imgs > 0.5).astype(jnp.float32)
        a1 = augment_batch(rng, imgs, masks)
        a2 = augment_batch(rng, imgs, masks)
        np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))


class _PoisonDataset:
    """Raises on one index — prefetch must surface it, not end the epoch."""

    def __init__(self, n=8, bad=5):
        self.n, self.bad = n, bad

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i == self.bad:
            raise ValueError("corrupt sample")
        a = np.full((4, 4, 1), float(i), np.float32)
        return {"image": a, "mask": a}


def test_batchloader_prefetch_propagates_worker_errors():
    from mdeical_image_segmentation_tpu.data.collate import BatchLoader

    loader = BatchLoader(_PoisonDataset(), batch_size=2, prefetch=2)
    with pytest.raises(ValueError, match="corrupt sample"):
        list(loader)


def test_batchloader_process_shard_partitions_global_batches():
    from mdeical_image_segmentation_tpu.data.collate import BatchLoader

    class _Idx:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            a = np.full((2, 2, 1), float(i), np.float32)
            return {"image": a, "mask": a}

    full = [
        b["images"][..., 0, 0, 0]
        for b in BatchLoader(_Idx(), 4, shuffle=True, seed=3, prefetch=0)
    ]
    shards = [
        [
            b["images"][..., 0, 0, 0]
            for b in BatchLoader(
                _Idx(), 4, shuffle=True, seed=3, prefetch=0,
                process_shard=(p, 2),
            )
        ]
        for p in range(2)
    ]
    for k, fb in enumerate(full):
        np.testing.assert_array_equal(
            np.concatenate([shards[0][k], shards[1][k]]), fb
        )


def test_batchloader_wrap_pad_handles_tiny_datasets():
    """batch_size > 2·len(dataset) must still fill the batch (regression:
    eval with per_device_batch·8 devices > small synthetic eval set)."""
    from mdeical_image_segmentation_tpu.data.collate import BatchLoader

    class _Tiny:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            a = np.full((2, 2, 1), float(i), np.float32)
            return {"image": a, "mask": a}

    batches = list(BatchLoader(_Tiny(), 16, prefetch=0))
    assert len(batches) == 1
    assert batches[0]["images"].shape[0] == 16
    # first 3 rows are the real samples, the rest wrap
    np.testing.assert_array_equal(
        batches[0]["images"][:, 0, 0, 0],
        np.tile([0.0, 1.0, 2.0], 6)[:16],
    )

    # drop_last (the TRAIN path) must also yield one wrap-padded batch for a
    # dataset smaller than the global batch (regression: DRIVE's 13-image
    # train split under an 8-device mesh crashed with an empty epoch)
    train_loader = BatchLoader(_Tiny(), 16, shuffle=True, prefetch=0)
    assert len(train_loader) == 1
    train_batches = list(train_loader)
    assert len(train_batches) == 1
    assert train_batches[0]["images"].shape[0] == 16


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    """A DRIVE-layout PNG directory for out-of-core streaming tests."""
    from PIL import Image

    root = tmp_path_factory.mktemp("drive_like")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.RandomState(0)
    for i in range(20):
        img = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
        lab = ((rng.rand(96, 96) > 0.5) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"{i:02d}.png")
        Image.fromarray(lab).save(root / "labels" / f"{i:02d}.png")
    return str(root)


def test_streaming_dataset_matches_cached(png_dir):
    """Out-of-core mode (cache=False + decode workers) must produce the exact
    same batches as the RAM-cached dataset."""
    from mdeical_image_segmentation_tpu.data.collate import BatchLoader
    from mdeical_image_segmentation_tpu.data.png2d import DRIVEDataset

    cached = DRIVEDataset(png_dir, mode="train", resolution=64, cache=True)
    streamed = DRIVEDataset(png_dir, mode="train", resolution=64, cache=False)
    assert len(cached) == len(streamed) == 13  # seed-42 split quirk: 13/4/3 of 20

    kw = dict(batch_size=4, shuffle=True, seed=5)
    for bc, bs in zip(
        BatchLoader(cached, **kw, prefetch=0),
        BatchLoader(streamed, **kw, prefetch=2, num_workers=4),
    ):
        np.testing.assert_array_equal(bc["images"], bs["images"])
        np.testing.assert_array_equal(bc["labels"], bs["labels"])


def test_streaming_keeps_loader_throughput(png_dir):
    """Decode workers must hide most of the per-sample decode cost: the
    streamed loader with 4 workers should stay within a small factor of the
    fully-RAM-cached loader (generous bound — CI timing noise)."""
    import time

    from mdeical_image_segmentation_tpu.data.collate import BatchLoader
    from mdeical_image_segmentation_tpu.data.png2d import DRIVEDataset

    cached = DRIVEDataset(png_dir, mode="train", resolution=256, cache=True)
    for i in range(len(cached)):
        cached[i]  # warm the RAM cache
    streamed = DRIVEDataset(png_dir, mode="train", resolution=256, cache=False)

    def epoch_time(ds, **kw):
        loader = BatchLoader(ds, 4, shuffle=True, seed=5, **kw)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            n = sum(1 for _ in loader)
            best = min(best, time.perf_counter() - t0)
        assert n == 3
        return best

    t_cached = epoch_time(cached, prefetch=0)
    t_streamed = epoch_time(streamed, prefetch=2, num_workers=4)
    # the real bound is "TPU not starved" (bench-level); here we just pin
    # that parallel decode beats any pathological serialization
    assert t_streamed < max(t_cached * 25, 2.5), (t_streamed, t_cached)
