"""3D transform library: shared-seed geometry lock, per-transform semantics,
label→boundary/affinity channels, skimage-compat primitives."""

import numpy as np
import pytest

from mdeical_image_segmentation_tpu.transforms import Transformer
from mdeical_image_segmentation_tpu.transforms.skimage_compat import (
    find_boundaries,
    label,
)
from mdeical_image_segmentation_tpu.transforms.volume import (
    BlobsToMask,
    CropToFixed,
    ElasticDeformation,
    LabelToAffinities,
    LabelToZAffinities,
    Normalize,
    RandomFlip,
    RandomRotate90,
    Relabel,
    Standardize,
    StandardLabelToBoundary,
    ToTensor,
)


def rs(seed=0):
    return np.random.RandomState(seed)


class TestGeometryLock:
    def test_raw_label_same_random_geometry(self):
        """The Transformer seeds raw and label pipelines identically
        (reference transforms.py:751): random flips/rotations must agree."""
        cfg = {
            "raw": [
                {"name": "RandomFlip"},
                {"name": "RandomRotate90"},
                {"name": "ToTensor", "expand_dims": True},
            ],
            "label": [
                {"name": "RandomFlip"},
                {"name": "RandomRotate90"},
                {"name": "ToTensor", "expand_dims": True},
            ],
        }
        t = Transformer(cfg, {"mean": None, "std": None, "pmin": None, "pmax": None})
        raw_t = t.raw_transform()
        lab_t = t.label_transform()
        vol = rs(1).rand(8, 16, 16).astype(np.float32)
        out_raw = raw_t(vol.copy())
        out_lab = lab_t(vol.copy())
        np.testing.assert_array_equal(out_raw, out_lab)

    def test_different_transformers_different_seeds(self):
        cfg = {"raw": [{"name": "RandomFlip"}, {"name": "ToTensor", "expand_dims": True}]}
        t1 = Transformer(cfg, {})
        t2 = Transformer(cfg, {})
        assert t1.seed != t2.seed


class TestGeometric:
    def test_random_flip_4d_consistent_channels(self):
        f = RandomFlip(rs(3), axis_prob=0.0)  # always flips (uniform > 0)
        m = rs(4).rand(2, 4, 4, 4)
        out = f(m)
        np.testing.assert_array_equal(out[0], np.flip(m[0], (0, 1, 2)))

    def test_rot90_z_plane_only(self):
        r = RandomRotate90(rs(0))
        m = np.arange(2 * 4 * 4).reshape(2, 4, 4).astype(float)
        out = r(m)
        # z-slices rotated independently, z-extent unchanged
        assert out.shape == (2, 4, 4)

    def test_crop_to_fixed_smaller(self):
        c = CropToFixed(rs(0), size=(8, 8))
        m = rs(1).rand(4, 16, 16)
        assert c(m).shape == (4, 8, 8)

    def test_crop_to_fixed_pad_larger(self):
        c = CropToFixed(rs(0), size=(20, 24), centered=True)
        m = rs(1).rand(4, 16, 16)
        assert c(m).shape == (4, 20, 24)

    def test_elastic_deformation_executes(self):
        e = ElasticDeformation(rs(0), spline_order=0, execution_probability=1.0,
                               alpha=100, sigma=10)
        m = (rs(1).rand(8, 32, 32) > 0.5).astype(np.int32)
        out = e(m)
        assert out.shape == m.shape
        assert set(np.unique(out)) <= {0, 1}  # order-0 keeps label values


class TestNormalizers:
    def test_standardize_global_stats(self):
        s = Standardize(mean=2.0, std=4.0)
        m = np.full((2, 2, 2), 10.0)
        np.testing.assert_allclose(s(m), np.full((2, 2, 2), 2.0))

    def test_standardize_computed(self):
        m = rs(0).rand(4, 4, 4)
        out = Standardize()(m)
        assert abs(out.mean()) < 1e-7 and abs(out.std() - 1) < 1e-6

    def test_normalize_01(self):
        m = rs(1).rand(4, 4, 4) * 10 - 5
        out = Normalize(norm01=True)(m)
        assert out.min() >= 0 and out.max() <= 1

    def test_normalize_pm1(self):
        m = rs(2).rand(4, 4, 4)
        out = Normalize()(m)
        assert out.min() >= -1 and out.max() <= 1


class TestLabelTransforms:
    def _two_blob_volume(self):
        m = np.zeros((8, 16, 16), np.int64)
        m[:, 2:7, 2:7] = 1
        m[:, 9:14, 9:14] = 2
        return m

    def test_standard_label_to_boundary(self):
        m = self._two_blob_volume()
        out = StandardLabelToBoundary()(m)
        assert out.shape == (1, 8, 16, 16)
        assert set(np.unique(out)) <= {0, 1}
        assert out.sum() > 0

    def test_blobs_to_mask(self):
        m = self._two_blob_volume()
        out = BlobsToMask()(m)
        np.testing.assert_array_equal(out[0], (m > 0).astype(np.uint8))

    def test_blobs_to_mask_cross_entropy_boundary(self):
        m = self._two_blob_volume()
        out = BlobsToMask(boundary=True, cross_entropy=True)(m)
        assert set(np.unique(out)) <= {0, 1, 2}

    def test_label_to_affinities_channel_count(self):
        m = self._two_blob_volume()
        out = LabelToAffinities(offsets=[1, 2])(m)
        assert out.shape == (6, 8, 16, 16)  # 2 offsets × 3 axes

    def test_label_to_z_affinities(self):
        m = self._two_blob_volume()
        out = LabelToZAffinities(offsets=[1])(m)
        assert out.shape == (1, 8, 16, 16)

    def test_aggregated_affinities(self):
        m = self._two_blob_volume()
        out = LabelToAffinities(offsets=[1], aggregate_affinities=True)(m)
        assert out.shape == (1, 8, 16, 16)

    def test_relabel_consecutive(self):
        m = np.array([[[10, 10, 0], [6, 6, 0], [0, 0, 0]]])
        out = Relabel(run_cc=False)(m)
        assert set(np.unique(out)) == {0, 1, 2}

    def test_ignore_index_recovery(self):
        m = self._two_blob_volume()
        m[0, 0, 0] = -1
        out = StandardLabelToBoundary(ignore_index=-1)(m)
        assert out[0, 0, 0, 0] == -1


class TestToTensor:
    def test_3d_gets_trailing_channel(self):
        out = ToTensor(expand_dims=True)(np.zeros((4, 8, 8)))
        assert out.shape == (4, 8, 8, 1)

    def test_4d_channelfirst_to_channellast(self):
        out = ToTensor(expand_dims=True)(np.zeros((3, 4, 8, 8)))
        assert out.shape == (4, 8, 8, 3)


class TestSkimageCompat:
    def test_label_two_components(self):
        m = np.zeros((10, 10), np.int32)
        m[1:3, 1:3] = 5
        m[6:9, 6:9] = 5
        lab, n = label(m, return_num=True)
        assert n == 2
        assert lab[1, 1] != lab[7, 7]

    def test_label_same_value_diagonal_connectivity(self):
        m = np.zeros((4, 4), np.int32)
        m[0, 0] = 1
        m[1, 1] = 1  # diagonal: connected under full connectivity
        lab, n = label(m, return_num=True)
        assert n == 1

    def test_find_boundaries_thick(self):
        m = np.zeros((8, 8), np.int32)
        m[2:6, 2:6] = 1
        b = find_boundaries(m, connectivity=2, mode="thick")
        assert b[2, 2] and b[1, 1]  # both sides of the edge
        assert not b[4, 4] and not b[0, 0]

    def test_find_boundaries_outer(self):
        m = np.zeros((8, 8), np.int32)
        m[2:6, 2:6] = 1
        b = find_boundaries(m, connectivity=2, mode="outer")
        assert b[1, 2] and not b[2, 2]  # background side only

    def test_find_boundaries_inner(self):
        m = np.zeros((8, 8), np.int32)
        m[2:6, 2:6] = 1
        b = find_boundaries(m, connectivity=2, mode="inner")
        assert b[2, 2] and not b[1, 2]  # object side only


def test_transform_gallery_script_builds(tmp_path):
    """The visual-sanity gallery (reference transformer-test.ipynb equivalent)
    renders a grid image per pipeline."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "transform_gallery",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "scripts", "transform_gallery.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    paths = mod.build_gallery(str(tmp_path))
    for p in paths:
        assert os.path.getsize(p) > 10_000  # a real rendered grid, not a stub
