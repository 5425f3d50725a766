"""Visual sanity grid for the 3D transform library.

Script equivalent of the reference's eyeball notebook
(/root/reference/augment/unet3d_augment/transformer-test.ipynb): every
spatial/intensity transform is applied to a synthetic "ovule-like" volume
(nested blobs + noise) and the middle-z slices are tiled into
``output/transform_gallery/{raw,label}_transforms.png`` so a human can
confirm geometry and intensity behavior at a glance.

Run:  python scripts/transform_gallery.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdeical_image_segmentation_tpu.transforms import volume as V  # noqa: E402
from mdeical_image_segmentation_tpu.utils.viz import show_transform_grid  # noqa: E402


def synthetic_volume(shape=(32, 96, 96), seed=11):
    """Blobby cell-like raw volume + its integer label volume."""
    rng = np.random.RandomState(seed)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]].astype(np.float32)
    zz, yy, xx = zz / shape[0], yy / shape[1], xx / shape[2]
    label = np.zeros(shape, np.uint16)
    raw = np.zeros(shape, np.float32)
    for i in range(1, 7):
        cz, cy, cx = rng.rand(3)
        r = 0.12 + 0.12 * rng.rand()
        blob = ((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) < r**2
        label[blob] = i
        raw += blob * (0.5 + 0.5 * rng.rand())
    raw += 0.15 * rng.rand(*shape).astype(np.float32)
    return raw.astype(np.float32), label


def build_gallery(outdir: str):
    os.makedirs(outdir, exist_ok=True)
    raw, label = synthetic_volume()
    rs = lambda: np.random.RandomState(47)  # noqa: E731

    raw_transforms = [
        ("RandomFlip", V.RandomFlip(rs())),
        ("RandomRotate90", V.RandomRotate90(rs())),
        ("RandomRotate", V.RandomRotate(rs(), angle_spectrum=30)),
        ("RandomContrast", V.RandomContrast(rs(), execution_probability=1.0)),
        ("ElasticDeformation", V.ElasticDeformation(
            rs(), spline_order=3, execution_probability=1.0)),
        ("CropToFixed", V.CropToFixed(rs(), size=(64, 64))),
        ("Standardize", V.Standardize(mean=float(raw.mean()), std=float(raw.std()))),
        ("PercentileNormalizer", V.PercentileNormalizer(
            pmin=float(np.percentile(raw, 1)), pmax=float(np.percentile(raw, 99.6)))),
        ("Normalize", V.Normalize(min_value=float(raw.min()), max_value=float(raw.max()))),
        ("AdditiveGaussianNoise", V.AdditiveGaussianNoise(
            rs(), execution_probability=1.0)),
        ("AdditivePoissonNoise", V.AdditivePoissonNoise(
            rs(), execution_probability=1.0)),
        ("GaussianBlur3D", V.GaussianBlur3D(execution_probability=1.0)),
    ]
    label_transforms = [
        ("StandardLabelToBoundary", V.StandardLabelToBoundary()),
        ("BlobsToMask", V.BlobsToMask()),
        ("LabelToAffinities", V.LabelToAffinities(offsets=[1, 4])),
        ("LabelToZAffinities", V.LabelToZAffinities(offsets=[1])),
        ("RandomLabelToAffinities", V.RandomLabelToAffinities(rs())),
        ("Relabel", V.Relabel()),
    ]

    paths = []
    paths.append(show_transform_grid(
        raw, [t for _, t in raw_transforms], [n for n, _ in raw_transforms],
        save_path=os.path.join(outdir, "raw_transforms.png"),
    ))
    paths.append(show_transform_grid(
        label.astype(np.float32),
        [t for _, t in label_transforms], [n for n, _ in label_transforms],
        save_path=os.path.join(outdir, "label_transforms.png"),
    ))
    return paths


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "output/transform_gallery"
    for p in build_gallery(out):
        print(p)
