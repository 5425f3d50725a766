"""Config-driven loader assembly for the volumetric pipeline.

Reference: get_train_loaders / get_test_loaders / default_prediction_collate
(/root/reference/dataset/unet3d_dataset/utils.py:182-287).  torch DataLoader
is replaced by a torchless ``VolumeLoader``: deterministic shuffling, tuple
collation to stacked numpy arrays, and a daemon-thread prefetch queue (the
host-side parallelism that replaces DataLoader worker processes — patches are
assembled while the device is busy with the previous step).

Batch-size semantics: the reference multiplies batch_size by the GPU count
under DataParallel (utils.py:214-217); here the equivalent scale-out knob is
the mesh's data-axis size, applied by the caller (trainer3d) — the loaders
take the final global batch size.
"""

from __future__ import annotations

import collections.abc
import os
import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..configs.registry import Registry
from ..logging_utils import get_logger

logger = get_logger("Dataset")

DATASETS = Registry("dataset")


def _register_builtin_datasets():
    from .dsb import DSB2018Dataset
    from .hdf5 import LazyHDF5Dataset, StandardHDF5Dataset

    for cls in (StandardHDF5Dataset, LazyHDF5Dataset, DSB2018Dataset):
        if cls.__name__ not in DATASETS:
            DATASETS.register(cls.__name__)(cls)


class ConcatDataset:
    """Concatenation of indexable datasets (torch ConcatDataset equivalent)."""

    def __init__(self, datasets: Sequence[Any]):
        assert len(datasets) > 0, "datasets should not be an empty iterable"
        self.datasets = list(datasets)
        self.cumulative_sizes = np.cumsum([len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self.cumulative_sizes[-1])

    def __getitem__(self, idx: int):
        dataset_idx = int(np.searchsorted(self.cumulative_sizes, idx, side="right"))
        sample_idx = idx - (
            0 if dataset_idx == 0 else int(self.cumulative_sizes[dataset_idx - 1])
        )
        return self.datasets[dataset_idx][sample_idx]


def default_prediction_collate(batch):
    """Collate arrays / slice-tuples / sequences (reference utils.py:274-287)."""
    error_msg = "batch must contain arrays or slice; found {}"
    if isinstance(batch[0], np.ndarray):
        return np.stack(batch, 0)
    if isinstance(batch[0], tuple) and isinstance(batch[0][0], slice):
        return batch
    if isinstance(batch[0], collections.abc.Sequence):
        transposed = zip(*batch)
        return [default_prediction_collate(samples) for samples in transposed]
    raise TypeError(error_msg.format(type(batch[0])))


class VolumeLoader:
    """Minimal DataLoader over tuple-sample datasets with thread prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        *,
        shuffle: bool = False,
        seed: int = 0,
        collate_fn: Callable = default_prediction_collate,
        prefetch: int = 2,
        drop_last: bool = False,
        num_workers: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self.drop_last = drop_last
        # intra-batch sample parallelism: the heavy host transforms (elastic
        # deformation ≈1s/patch, scipy C code releasing the GIL) fan out over
        # a thread pool — the torchless replacement for DataLoader workers
        self.num_workers = num_workers
        self._pool = None
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            # static-shape mode: a short tail (or a dataset smaller than one
            # batch) is wrap-padded rather than dropped, so there is always
            # at least one batch
            return max(n // self.batch_size, 1) if n else 0
        return -(-n // self.batch_size)

    def close(self):
        """Release the worker thread pool (also runs on GC)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self) -> Iterator[Any]:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        self._epoch += 1
        batches = [
            order[i : i + self.batch_size] for i in range(0, n, self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            if len(batches) > 1:
                batches.pop()
            else:
                # dataset smaller than one global batch: wrap-pad to keep
                # static shapes instead of yielding nothing
                reps = -(-self.batch_size // n)
                batches[0] = np.tile(order, reps)[: self.batch_size]

        if self.num_workers > 0 and self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def assemble(idx):
            if self._pool is not None:
                samples = list(
                    self._pool.map(lambda i: self.dataset[int(i)], idx)
                )
            else:
                samples = [self.dataset[int(i)] for i in idx]
            return self.collate_fn(samples)

        if self.prefetch <= 0:
            for idx in batches:
                yield assemble(idx)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        cancel = threading.Event()  # set when the consumer abandons us

        def _put(item) -> bool:
            """Bounded put that gives up when the iterator was abandoned —
            otherwise a discarded iterator (e.g. trainer3d's validate_iters
            early break) pins this thread on a full queue forever, holding
            assembled volumetric batches (same fix as BatchLoader)."""
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # propagate assembly failures to the consumer instead of
            # silently ending the epoch on truncated data
            try:
                for idx in batches:
                    if cancel.is_set() or not _put(assemble(idx)):
                        return
                _put(stop)
            except BaseException as exc:  # noqa: BLE001
                _put(exc)

        threading.Thread(target=producer, daemon=True).start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # runs on StopIteration AND on GeneratorExit (abandoned
            # iterator): unblocks the producer so it can exit
            cancel.set()


def _dataset_class(loaders_config: Dict[str, Any]):
    _register_builtin_datasets()
    name = loaders_config.get("dataset")
    if name is None:
        name = "StandardHDF5Dataset"
        logger.warning(
            f"loaders config names no dataset class; defaulting to '{name}'"
        )
    return DATASETS.get(name)


def get_train_loaders(
    config: Dict[str, Any], n_devices: int = 1, mesh=None
) -> Dict[str, VolumeLoader]:
    """{'train': loader, 'val': loader} (reference utils.py:182-227).

    ``n_devices`` plays the role of the reference's GPU count: the global
    batch is batch_size × n_devices.

    ``loaders: {device_cache: true}`` (TPU extension, needs ``mesh``) keeps
    the train volumes HBM-resident and samples/augments patches inside a
    jitted program — see data/device_cache.py.  Unsupported pipelines
    (elastic deformation, weight maps, …) fall back to the host loader
    with a warning.
    """
    assert "loaders" in config, "config is missing its 'loaders' section"
    loaders_config = config["loaders"]
    logger.info("assembling train/val loaders")
    dataset_class = _dataset_class(loaders_config)

    # leakage guard on the EXPANDED file lists: comparing the raw config
    # strings would miss a val file listed inside a train directory
    from .volume_utils import traverse_h5_paths

    train_files = {
        os.path.realpath(p)
        for p in traverse_h5_paths(loaders_config["train"]["file_paths"])
    }
    val_files = {
        os.path.realpath(p)
        for p in traverse_h5_paths(loaders_config["val"]["file_paths"])
    }
    assert train_files.isdisjoint(val_files), (
        "train and val file_paths intersect — the val volumes would leak "
        f"into training: {sorted(train_files & val_files)}"
    )

    train_datasets = dataset_class.create_datasets(loaders_config, phase="train")
    val_datasets = dataset_class.create_datasets(loaders_config, phase="val")

    batch_size = loaders_config.get("batch_size", 1)
    if n_devices > 1:
        logger.info(
            f"{n_devices} devices available. Using batch_size = {n_devices} * {batch_size}"
        )
        batch_size = batch_size * n_devices
    num_workers = loaders_config.get("num_workers", 1)
    logger.info(f"train/val loaders: {num_workers} worker threads")
    prefetch = 2 if num_workers else 0

    train_loader = None
    if loaders_config.get("device_cache") and mesh is None:
        logger.warning(
            "device_cache requested but no mesh was provided (spatial mode "
            "or a bare get_train_loaders call) — using the host loader"
        )
    if loaders_config.get("device_cache") and mesh is not None:
        from .device_cache import DeviceCachedVolumeLoader, DeviceCacheUnsupported

        try:
            train_loader = DeviceCachedVolumeLoader(
                train_datasets,
                batch_size=batch_size,
                mesh=mesh,
                seed=config.get("seed", 0),
                cache_dtype=loaders_config.get("device_cache_dtype", "float32"),
                budget_gb=float(
                    loaders_config.get("device_cache_budget_gb", 4.0)
                ),
            )
        except DeviceCacheUnsupported as e:
            logger.warning(
                f"device_cache requested but unsupported ({e}); "
                "falling back to the host loader"
            )
    if train_loader is None:
        train_loader = VolumeLoader(
            ConcatDataset(train_datasets), batch_size=batch_size, shuffle=True,
            prefetch=prefetch, drop_last=True, num_workers=num_workers,
        )
    return {
        "train": train_loader,
        "val": VolumeLoader(
            ConcatDataset(val_datasets), batch_size=batch_size, shuffle=False,
            prefetch=prefetch, num_workers=num_workers,
        ),
    }


def get_test_loaders(config: Dict[str, Any], n_devices: int = 1) -> Iterator[VolumeLoader]:
    """Generator of per-file test loaders (reference utils.py:230-271)."""
    assert "loaders" in config, "config is missing its 'loaders' section"
    loaders_config = config["loaders"]
    logger.info("assembling test loaders")
    dataset_class = _dataset_class(loaders_config)

    test_datasets = dataset_class.create_datasets(loaders_config, phase="test")
    batch_size = loaders_config.get("batch_size", 1)
    if n_devices > 1:
        batch_size = batch_size * n_devices

    for test_dataset in test_datasets:
        logger.info(f"test volume: {test_dataset.file_path}")
        collate_fn = getattr(
            test_dataset, "prediction_collate", default_prediction_collate
        )
        yield VolumeLoader(
            test_dataset, batch_size=batch_size, collate_fn=collate_fn
        )
