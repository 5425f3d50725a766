"""HBM-resident 3D training data path (``loaders: {device_cache: true}``).

TPU extension with no reference counterpart: the reference streams every
patch host->device through a torch DataLoader each step
(/root/reference/dataset/unet3d_dataset/hdf5.py + utils.py:182-227).  On a
remote-attached chip — and on pods where host->device bandwidth is shared —
that per-step H2D transfer dominates the 3D train step (PERF.md
"End-to-end training": 0.5-1 s/step through this tunnel vs a ~100 ms
device step).  This module uploads the *volumes* once and moves only int32
patch coordinates per step:

  host   SliceBuilder grid (the exact reference patch coverage), per-epoch
         shuffling and wrap-padded batching -> a (B, 4) int32 coordinate
         array (volume, z, y, x)
  device one jitted program: vmapped ``lax.dynamic_slice`` patch
         extraction out of the stacked HBM-resident volumes, then the
         random augmentations (reference quirk semantics preserved — e.g.
         RandomFlip flips when u > axis_prob), outputs landing
         batch-sharded over the mesh's data axis.

Supported transforms (everything else raises :class:`DeviceCacheUnsupported`
and the trainer falls back to the host loader with a warning):

  raw    Standardize (global-stats form applied once at cache time;
         per-patch form computed on device), RandomFlip, RandomRotate90,
         RandomContrast, AdditiveGaussianNoise, AdditivePoissonNoise,
         ToTensor
  label  RandomFlip, RandomRotate90, ToTensor — the geometric subsequence
         must match the raw pipeline's (same order, same parameters); both
         sides then consume the SAME per-patch PRNG key, which is the
         device equivalent of the host pipelines' shared-seed
         RandomState lock (transforms/volume.py::Transformer).

Interpolating transforms (RandomRotate, ElasticDeformation) are
deliberately NOT reimplemented: they are order-3 scipy spline resamples
and a TPU approximation (``map_coordinates`` supports order<=1) would
silently change the augmentation distribution.  Configs using them keep
the host path.

This is an opt-in throughput mode, not a parity mode: augmentation draws
come from the device PRNG, so sample streams differ from the host path by
construction (the patch COVERAGE is identical — same SliceBuilder grid).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..logging_utils import get_logger
from ..parallel import mesh as mesh_lib
from .hdf5 import AbstractHDF5Dataset

logger = get_logger("DeviceCache")

_RAW_SUPPORTED = {
    "Standardize",
    "RandomFlip",
    "RandomRotate90",
    "RandomContrast",
    "AdditiveGaussianNoise",
    "AdditivePoissonNoise",
    "ToTensor",
}
_LABEL_SUPPORTED = {"RandomFlip", "RandomRotate90", "ToTensor"}
_GEOMETRIC = {"RandomFlip", "RandomRotate90"}


class DeviceCacheUnsupported(ValueError):
    """Raised when a dataset/pipeline can't run HBM-resident; callers fall
    back to the host loader."""


def _as_dhwc(vol: np.ndarray) -> np.ndarray:
    """DxHxW or CxDxHxW numpy volume -> (D, H, W, C), matching ToTensor's
    channel handling (transforms/volume.py::ToTensor)."""
    if vol.ndim == 3:
        return vol[..., None]
    if vol.ndim == 4:
        return np.moveaxis(vol, 0, -1)
    raise DeviceCacheUnsupported(f"volume ndim {vol.ndim} not in (3, 4)")


def _resolve_dtype(entry: Dict[str, Any]) -> np.dtype:
    dtype = entry.get("dtype", np.float32)
    if isinstance(dtype, str) and dtype == "long":  # torch-config spelling
        dtype = np.int64
    return np.dtype(dtype)


def _geometry_params(entry: Dict[str, Any]) -> Tuple[str, Tuple]:
    """Canonical (name, params) tuple used to check the raw/label geometric
    subsequences match (the shared-RNG lock requires identical draws)."""
    name = entry["name"]
    if name == "RandomFlip":
        return (name, (float(entry.get("axis_prob", 0.5)),))
    return (name, ())


class DeviceCachedVolumeLoader:
    """Train-phase loader over HDF5 datasets whose volumes live in HBM.

    Yields ``(raw, label, None)`` tuples of device arrays, batch-sharded
    over ``mesh``'s data axis — drop-in for the (input, target, weight)
    triple the trainer's host path produces after ``_split_training_batch``
    (no further ``device_put`` needed, hence ``is_device_cached``).
    """

    is_device_cached = True

    def __init__(
        self,
        datasets: Sequence[AbstractHDF5Dataset],
        batch_size: int,
        mesh,
        seed: int = 0,
        cache_dtype: str = "float32",
        budget_gb: float = 4.0,
    ):
        import jax
        import jax.numpy as jnp

        if not datasets:
            raise DeviceCacheUnsupported("no train datasets")
        if jax.process_count() > 1:
            raise DeviceCacheUnsupported(
                "device_cache is single-process (multi-host runs need "
                "per-process loader shards — use the host loader)"
            )
        for ds in datasets:
            if not isinstance(ds, AbstractHDF5Dataset):
                raise DeviceCacheUnsupported(
                    f"{type(ds).__name__} is not an HDF5 dataset"
                )
            if ds.phase != "train":
                raise DeviceCacheUnsupported("device_cache is train-only")
            if ds.weight_internal_path is not None:
                raise DeviceCacheUnsupported("per-voxel weight maps")

        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self._mesh = mesh
        self._epoch = 0
        self._step = 0

        raw_cfg = datasets[0].transformer.phase_config["raw"]
        label_cfg = datasets[0].transformer.phase_config["label"]
        self._validate_pipelines(raw_cfg, label_cfg)
        # Standardize entries whose (entry-or-global) stats existed were
        # baked into the cached volume; only stats-less entries compute the
        # per-PATCH z-score on device (global_normalization: false)
        stats0 = datasets[0].transformer.config_base
        self._baked = {
            j
            for j, e in enumerate(raw_cfg)
            if e["name"] == "Standardize"
            and e.get("mean", stats0.get("mean")) is not None
        }

        # per-dataset volumes + coordinates ---------------------------------
        raws: List[np.ndarray] = []
        labels: List[np.ndarray] = []
        coords: List[np.ndarray] = []
        patch: Optional[Tuple[int, int, int]] = None
        for v, ds in enumerate(datasets):
            raw, label = self._load_volume(ds, raw_cfg)
            raws.append(raw)
            labels.append(label)
            c, p = self._patch_coords(ds)
            patch = patch or p
            if p != patch:
                raise DeviceCacheUnsupported(
                    f"patch shapes differ across datasets: {p} vs {patch}"
                )
            coords.append(
                np.concatenate([np.full((len(c), 1), v, np.int32), c], axis=1)
            )
        assert patch is not None
        self._patch = patch
        self._coords = np.concatenate(coords, axis=0)
        self._n = len(self._coords)
        if any(e["name"] == "RandomRotate90" for e in raw_cfg) and (
            patch[1] != patch[2]
        ):
            raise DeviceCacheUnsupported(
                f"RandomRotate90 needs square (H, W) patches under jit "
                f"(static shapes); got {patch[1]}x{patch[2]}"
            )

        # stack padded to the max volume shape (SliceBuilder coordinates are
        # in-bounds for each TRUE volume, so padding is never read)
        cache_np = np.dtype(
            np.float32 if cache_dtype == "float32" else jnp.bfloat16
        )
        self._label_dtype = _resolve_dtype(
            next(e for e in label_cfg if e["name"] == "ToTensor")
        )
        raw_stack = self._pad_stack(raws).astype(cache_np)
        label_stack = self._pad_stack(labels).astype(self._label_dtype)
        total = raw_stack.nbytes + label_stack.nbytes
        if total > budget_gb * 2**30:
            raise DeviceCacheUnsupported(
                f"volumes need {total / 2**30:.2f} GiB > budget "
                f"{budget_gb} GiB (loaders: {{device_cache_budget_gb: N}})"
            )
        rep = mesh_lib.replicated_sharding(mesh)
        self._raws = jax.device_put(raw_stack, rep)
        self._labels = jax.device_put(label_stack, rep)
        logger.info(
            f"device cache: {len(datasets)} volume(s), "
            f"{total / 2**20:.1f} MiB in HBM, {self._n} patches, "
            f"patch {patch}, global batch {self.batch_size}"
        )

        self._key = jax.random.PRNGKey(self.seed + 7)
        self._sample = self._build_sampler(raw_cfg, label_cfg)

    # -- pipeline validation / host-side prep -------------------------------

    @staticmethod
    def _validate_pipelines(raw_cfg, label_cfg) -> None:
        for entry in raw_cfg:
            if entry["name"] not in _RAW_SUPPORTED:
                raise DeviceCacheUnsupported(
                    f"raw transform '{entry['name']}' has no device lowering"
                )
        for entry in label_cfg:
            if entry["name"] not in _LABEL_SUPPORTED:
                raise DeviceCacheUnsupported(
                    f"label transform '{entry['name']}' has no device lowering"
                )
        raw_geom = [
            _geometry_params(e) for e in raw_cfg if e["name"] in _GEOMETRIC
        ]
        label_geom = [
            _geometry_params(e) for e in label_cfg if e["name"] in _GEOMETRIC
        ]
        if raw_geom != label_geom:
            raise DeviceCacheUnsupported(
                "raw/label geometric transforms differ — the shared-key "
                f"lock needs identical sequences ({raw_geom} vs {label_geom})"
            )

    def _load_volume(self, ds, raw_cfg) -> Tuple[np.ndarray, np.ndarray]:
        import h5py

        with h5py.File(ds.file_path, "r") as f:
            raw = _as_dhwc(f[ds.raw_internal_path][:]).astype(np.float32)
            label = _as_dhwc(f[ds.label_internal_path][:])
        # global-stats Standardize is deterministic and pointwise — bake it
        # into the cached volume (it commutes with flips/rot90; the
        # per-patch form stays on device in the sampler)
        stats = ds.transformer.config_base
        for entry in raw_cfg:
            if entry["name"] != "Standardize":
                continue
            mean = entry.get("mean", stats.get("mean"))
            std = entry.get("std", stats.get("std"))
            if mean is not None:
                eps = float(entry.get("eps", 1e-10))
                raw = (raw - mean) / np.clip(std, a_min=eps, a_max=None)
        return raw, label

    @staticmethod
    def _patch_coords(ds) -> Tuple[np.ndarray, Tuple[int, int, int]]:
        coords = []
        patch: Optional[Tuple[int, int, int]] = None
        for raw_idx, label_idx in zip(ds.raw_slices, ds.label_slices):
            r, l = raw_idx[-3:], label_idx[-3:]
            if tuple((s.start, s.stop) for s in r) != tuple(
                (s.start, s.stop) for s in l
            ):
                raise DeviceCacheUnsupported(
                    "raw/label patch grids differ (halo?) — host path only"
                )
            size = tuple(s.stop - s.start for s in r)
            patch = patch or size
            if size != patch:
                raise DeviceCacheUnsupported(
                    f"non-uniform patch sizes {size} vs {patch}"
                )
            coords.append([s.start for s in r])
        if patch is None:
            raise DeviceCacheUnsupported("dataset produced zero patches")
        return np.asarray(coords, np.int32), patch

    @staticmethod
    def _pad_stack(vols: List[np.ndarray]) -> np.ndarray:
        shape = tuple(max(v.shape[i] for v in vols) for i in range(4))
        out = np.zeros((len(vols),) + shape, vols[0].dtype)
        for i, v in enumerate(vols):
            out[i, : v.shape[0], : v.shape[1], : v.shape[2], : v.shape[3]] = v
        return out

    # -- the jitted sampler --------------------------------------------------

    def _build_sampler(self, raw_cfg, label_cfg):
        import jax
        import jax.numpy as jnp
        from jax import lax

        pd, ph, pw = self._patch
        c_raw = int(self._raws.shape[-1])
        c_label = int(self._labels.shape[-1])
        label_jdtype = self._label_dtype  # np.dtype; astype accepts it

        def _flip_pair(raw, label, key, axis_prob):
            # parity quirk preserved: flip when u > axis_prob
            # (transforms/volume.py::RandomFlip, reference transforms.py:25-50)
            us = jax.random.uniform(key, (3,))
            for axis in range(3):
                do = us[axis] > axis_prob
                raw = jnp.where(do, jnp.flip(raw, axis), raw)
                label = jnp.where(do, jnp.flip(label, axis), label)
            return raw, label

        def _rot90_pair(raw, label, key):
            k = jax.random.randint(key, (), 0, 4)
            rot = lambda n: (lambda m: jnp.rot90(m, n, axes=(1, 2)))
            branches = [rot(0), rot(1), rot(2), rot(3)]
            return lax.switch(k, branches, raw), lax.switch(k, branches, label)

        def _sample_one(raws, labels, coord, key):
            c = coord
            raw = lax.dynamic_slice(
                raws, (c[0], c[1], c[2], c[3], 0), (1, pd, ph, pw, c_raw)
            )[0].astype(jnp.float32)
            label = lax.dynamic_slice(
                labels, (c[0], c[1], c[2], c[3], 0), (1, pd, ph, pw, c_label)
            )[0]
            geom_j = 0
            for j, entry in enumerate(raw_cfg):
                name = entry["name"]
                if name in _GEOMETRIC:
                    # geometry keys are indexed by position among GEOMETRIC
                    # ops only, so the label side (whose list may omit the
                    # raw-only pointwise ops) sees identical draws
                    k = jax.random.fold_in(key, geom_j)
                    geom_j += 1
                    if name == "RandomFlip":
                        raw, label = _flip_pair(
                            raw, label, k, float(entry.get("axis_prob", 0.5))
                        )
                    else:
                        raw, label = _rot90_pair(raw, label, k)
                    continue
                k = jax.random.fold_in(key, 100 + j)  # raw-only streams
                if name == "Standardize":
                    if j not in self._baked:  # per-patch z-score form
                        eps = float(entry.get("eps", 1e-10))
                        if entry.get("channelwise", False):
                            axes = (0, 1, 2)
                            mu = jnp.mean(raw, axis=axes, keepdims=True)
                            sd = jnp.std(raw, axis=axes, keepdims=True)
                        else:
                            mu, sd = jnp.mean(raw), jnp.std(raw)
                        raw = (raw - mu) / jnp.maximum(sd, eps)
                elif name == "RandomContrast":
                    lo, hi = entry.get("alpha", (0.5, 1.5))
                    mean = float(entry.get("mean", 0.0))
                    p = float(entry.get("execution_probability", 0.1))
                    ku, ka = jax.random.split(k)
                    alpha = jax.random.uniform(ka, (), minval=lo, maxval=hi)
                    adj = jnp.clip(mean + alpha * (raw - mean), -1, 1)
                    raw = jnp.where(jax.random.uniform(ku) < p, adj, raw)
                elif name == "AdditiveGaussianNoise":
                    lo, hi = entry.get("scale", (0.0, 1.0))
                    p = float(entry.get("execution_probability", 0.1))
                    ku, ks, kn = jax.random.split(k, 3)
                    std = jax.random.uniform(ks, (), minval=lo, maxval=hi)
                    noisy = raw + std * jax.random.normal(kn, raw.shape)
                    raw = jnp.where(jax.random.uniform(ku) < p, noisy, raw)
                elif name == "AdditivePoissonNoise":
                    lo, hi = entry.get("lam", (0.0, 1.0))
                    p = float(entry.get("execution_probability", 0.1))
                    ku, kl, kn = jax.random.split(k, 3)
                    lam = jax.random.uniform(kl, (), minval=lo, maxval=hi)
                    noisy = raw + jax.random.poisson(kn, lam, raw.shape)
                    raw = jnp.where(jax.random.uniform(ku) < p, noisy, raw)
            return raw, label.astype(label_jdtype)

        out_shard = mesh_lib.batch_sharding(self._mesh, 5)

        @jax.jit
        def _sample(raws, labels, coords, key):
            keys = jax.random.split(key, coords.shape[0])
            raw, label = jax.vmap(
                _sample_one, in_axes=(None, None, 0, 0)
            )(raws, labels, coords, keys)
            return (
                lax.with_sharding_constraint(raw, out_shard),
                lax.with_sharding_constraint(label, out_shard),
            )

        return _sample

    # -- loader surface -------------------------------------------------------

    def __len__(self) -> int:
        return max(self._n // self.batch_size, 1) if self._n else 0

    def close(self) -> None:  # VolumeLoader interface parity
        pass

    def __iter__(self):
        import jax
        import jax.numpy as jnp

        order = np.random.RandomState(self.seed + self._epoch).permutation(
            self._n
        )
        self._epoch += 1
        if self._n < self.batch_size:
            # wrap-pad a tiny dataset to one full static-shape batch (same
            # rule as VolumeLoader's drop_last path)
            reps = -(-self.batch_size // self._n)
            batches = [np.tile(order, reps)[: self.batch_size]]
        else:
            batches = [
                order[i * self.batch_size : (i + 1) * self.batch_size]
                for i in range(self._n // self.batch_size)
            ]
        for idx in batches:
            coords = jnp.asarray(self._coords[idx])
            key = jax.random.fold_in(self._key, self._step)
            self._step += 1
            raw, label = self._sample(self._raws, self._labels, coords, key)
            yield raw, label, None
