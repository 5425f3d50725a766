"""2D PNG slice datasets (DRIVE / BUSI layouts) — host side.

Reference parity (/root/reference/dataset/unet2d_dataset/MYDataset.py):

- directory layouts: DRIVE = ``images/*`` + ``labels/*``; BUSI = grayscale
  ``images/*`` + masks under ``mask/0/*`` (MYDataset.py:76-77, 163-170);
- deterministic 70/20/10 train/eval/test split via two sklearn
  ``train_test_split`` calls with random_state=42 (MYDataset.py:85-94);
- nearest-neighbor resize to a fixed square resolution (512 in the
  reference, MYDataset.py:104) with cv2-style index rounding
  ``src = floor(dst * in/out)``;
- samples scaled to [0, 1]; masks get a trailing channel dim
  (MYDataset.py:152-155 — there NCHW, here channels-last).

TPU-first redesign: ``__getitem__`` does decode + resize + normalize ONLY.
The random augmentations (flip/rot90/transpose/brightness-contrast,
MYDataset.py:127-141) run **on device**, batched and jit-fused, via
``transforms.device2d.augment_batch`` — so the host loop stays cheap enough
to never starve the TPU, and decoded samples are memoized in RAM after first
touch (the datasets are small: DRIVE is 20 training images).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image
from sklearn.model_selection import train_test_split


def nearest_resize(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """cv2.INTER_NEAREST-style resize of (H, W[, C]) numpy arrays:
    source index = floor(dst * in/out) — matching albumentations' Resize with
    NEAREST interpolation in the reference pipeline."""
    h, w = img.shape[:2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return img
    ri = np.minimum((np.arange(oh) * h // oh), h - 1)
    ci = np.minimum((np.arange(ow) * w // ow), w - 1)
    return img[ri][:, ci]


class SliceDataset:
    """Base PNG-pair dataset with the reference's split + normalize contract.

    ``__getitem__`` → {"image": float32 (H, W, C) in [0,1],
                       "mask":  float32 (H, W, 1) in [0,1]}.
    """

    image_mode = "RGB"

    def __init__(
        self,
        data_path: str,
        mode: str = "train",
        *,
        train_ratio: float = 0.7,
        eval_ratio: float = 0.2,
        random_seed: int = 42,
        resolution: int = 512,
        cache: bool = True,
    ):
        self.resolution = resolution
        self.mode = mode
        images, masks = self._discover(data_path)
        if len(images) != len(masks):
            raise ValueError("The number of images and masks do not match.")

        # Two-stage split, seed-42 parity with MYDataset.py:85-94.
        train_images, temp_images, train_masks, temp_masks = train_test_split(
            images, masks, test_size=(1 - train_ratio), random_state=random_seed
        )
        eval_size = eval_ratio / (1 - train_ratio)
        eval_images, test_images, eval_masks, test_masks = train_test_split(
            temp_images, temp_masks, test_size=(1 - eval_size),
            random_state=random_seed,
        )
        split = {
            "train": (train_images, train_masks),
            "eval": (eval_images, eval_masks),
            "test": (test_images, test_masks),
        }
        if mode not in split:
            raise ValueError("Mode should be 'train', 'eval', or 'test'.")
        self.images_path, self.masks_path = split[mode]
        self.n_samples = len(self.images_path)
        self._cache: Optional[List] = [None] * self.n_samples if cache else None

        for p in self.masks_path:
            if not os.path.exists(p):
                print(f"file {p} does not exist.")

    def _discover(self, data_path: str) -> Tuple[List[str], List[str]]:
        return (
            sorted(glob(os.path.join(data_path, "images", "*"))),
            sorted(glob(os.path.join(data_path, "labels", "*"))),
        )

    def _load(self, index: int) -> Dict[str, np.ndarray]:
        image = Image.open(self.images_path[index]).convert(self.image_mode)
        mask = Image.open(self.masks_path[index]).convert("L")
        image = np.asarray(image)
        if image.ndim == 2:
            image = image[..., None]
        mask = np.asarray(mask)

        res = (self.resolution, self.resolution)
        image = nearest_resize(image, res)
        mask = nearest_resize(mask, res)

        return {
            "image": image.astype(np.float32) / 255.0,
            "mask": (mask.astype(np.float32) / 255.0)[..., None],
        }

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        if self._cache is not None:
            if self._cache[index] is None:
                self._cache[index] = self._load(index)
            return self._cache[index]
        return self._load(index)

    def __len__(self) -> int:
        return self.n_samples

    @property
    def num_channels(self) -> int:
        return 3 if self.image_mode == "RGB" else 1


class DRIVEDataset(SliceDataset):
    """Retinal-vessel DRIVE layout (RGB images + ``labels/``)."""


class BUSIDataset(SliceDataset):
    """Breast-ultrasound BUSI layout: grayscale images, masks in ``mask/0/``
    (reference MYDataset.py:163-192).  Parity note: the reference BUSI class
    does NOT re-split — it uses all samples in every mode; we keep the split
    machinery but default to the full set via mode='train' on an unsplit list
    being the reference behavior difference documented here (the reference
    bug of ignoring the split for BUSI is not replicated)."""

    image_mode = "L"

    def _discover(self, data_path: str):
        return (
            sorted(glob(os.path.join(data_path, "images", "*"))),
            sorted(glob(os.path.join(data_path, "mask", "0", "*"))),
        )


class SyntheticSliceDataset:
    """CPU-runnable synthetic binary-segmentation dataset (BASELINE.json
    config #1: 256×256 grayscale slices) — random blobs with their masks.

    Deterministic per index; generated lazily and cached.  Used by the e2e
    smoke tests and the throughput benchmark.
    """

    def __init__(
        self,
        n_samples: int = 64,
        resolution: int = 256,
        channels: int = 1,
        seed: int = 0,
        n_classes: int = 1,
    ):
        """``n_classes > 1`` switches to the multi-class contract
        (BASELINE config #2 / the reference's CrossEntropyLoss branch,
        unet.py:1184-1188): masks are integer class-id maps of shape (H, W)
        — no channel dim, as torch CrossEntropyLoss expects — with each blob
        assigned a foreground class in 1..n_classes-1 and a class-dependent
        intensity so the task is learnable."""
        self.n_samples = n_samples
        self.resolution = resolution
        self.channels = channels
        self.seed = seed
        assert n_classes >= 1
        self.n_classes = n_classes
        self._cache: List = [None] * n_samples

    def _make(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed * 100003 + index)
        r = self.resolution
        yy, xx = np.mgrid[0:r, 0:r].astype(np.float32) / r
        mask = np.zeros((r, r), np.float32)
        for _ in range(rng.randint(1, 4)):
            cy, cx = rng.rand(2)
            rad = 0.08 + 0.17 * rng.rand()
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2 < rad**2).astype(np.float32)
            if self.n_classes > 1:
                cls = float(rng.randint(1, self.n_classes))
                # later blobs overwrite earlier ones where they overlap
                mask = np.where(blob > 0, cls * blob, mask)
            else:
                mask = np.maximum(mask, blob)
        noise = rng.rand(r, r).astype(np.float32)
        if self.n_classes > 1:
            # class-dependent intensity makes classes separable from the image
            fg = (mask > 0).astype(np.float32)
            shade = mask / max(self.n_classes - 1, 1)
            image = np.clip(
                0.4 * fg + 0.3 * shade + 0.25 * noise + 0.05 * rng.rand(), 0, 1
            )
            image = np.repeat(image[..., None], self.channels, axis=-1)
            return {"image": image, "mask": mask.astype(np.int32)}
        image = np.clip(0.6 * mask + 0.3 * noise + 0.1 * rng.rand(), 0, 1)
        image = np.repeat(image[..., None], self.channels, axis=-1)
        return {"image": image, "mask": mask[..., None]}

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        if self._cache[index] is None:
            self._cache[index] = self._make(index)
        return self._cache[index]

    def __len__(self) -> int:
        return self.n_samples

    @property
    def num_channels(self) -> int:
        return self.channels
