"""Sliding-window predictor: overlap-average correctness (every voxel covered,
constant-input consistency), halo handling, lazy variant parity, segmentation
output, DSB per-image writes."""

import os

import h5py
import numpy as np
import pytest

import jax

from mdeical_image_segmentation_tpu.data import StandardHDF5Dataset, VolumeLoader
from mdeical_image_segmentation_tpu.infer import (
    DSB2018Predictor,
    LazyPredictor,
    StandardPredictor,
)
from mdeical_image_segmentation_tpu.models import get_model

TRANSFORMER = {"raw": [{"name": "ToTensor", "expand_dims": True}]}


@pytest.fixture(scope="module")
def model_and_vars(rng):
    model = get_model(
        {"name": "UNet3D", "in_channels": 1, "out_channels": 2, "f_maps": 8,
         "num_levels": 2}
    )
    import jax.numpy as jnp

    variables = model.init(rng, jnp.zeros((1, 8, 64, 64, 1)), False)
    return model, variables


@pytest.fixture(scope="module")
def volume_file(tmp_path_factory):
    root = tmp_path_factory.mktemp("pred")
    path = str(root / "vol.h5")
    raw = np.random.RandomState(0).rand(16, 96, 96).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=raw)
    return path


def _loader(path, halo=(0, 0, 0), stride=None):
    cfg = {
        "name": "SliceBuilder",
        "patch_shape": [8, 64, 64],
        "stride_shape": stride or [8, 64, 64],
        "halo_shape": list(halo),
    }
    ds = StandardHDF5Dataset(path, "test", cfg, TRANSFORMER,
                             global_normalization=False)
    return VolumeLoader(ds, batch_size=2, prefetch=0)


class TestStandardPredictor:
    def test_full_coverage_and_shape(self, model_and_vars, volume_file, tmp_path):
        model, variables = model_and_vars
        pred = StandardPredictor(model, variables, str(tmp_path), out_channels=2)
        out_file = pred(_loader(volume_file))
        with h5py.File(out_file, "r") as f:
            result = f["predictions"][:]
        assert result.shape == (2, 16, 96, 96)
        assert np.isfinite(result).all()  # every voxel visited ≥ once

    def test_int8_quantized_predictor_tracks_float(
        self, model_and_vars, volume_file, tmp_path
    ):
        """quantize='int8' (ops/quant.py): calibrates on the first batch,
        runs the rest through the s8 conv path; the overlap-averaged volume
        must track the float predictor closely."""
        model, variables = model_and_vars
        out_f = str(tmp_path / "f")
        out_q = str(tmp_path / "q")
        os.makedirs(out_f), os.makedirs(out_q)
        ff = StandardPredictor(model, variables, out_f, out_channels=2)(
            _loader(volume_file)
        )
        fq = StandardPredictor(
            model, variables, out_q, out_channels=2,
            quantize="int8", calib_batches=1,
        )(_loader(volume_file))
        with h5py.File(ff, "r") as f:
            a = f["predictions"][:]
        with h5py.File(fq, "r") as f:
            b = f["predictions"][:]
        assert np.isfinite(b).all()
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        assert rel < 0.15, rel
        # argmax segmentation agreement across the volume
        assert (a.argmax(0) == b.argmax(0)).mean() > 0.95

    def test_quantize_rejects_unknown_scheme(self, model_and_vars, tmp_path):
        model, variables = model_and_vars
        with pytest.raises(ValueError, match="quantize"):
            StandardPredictor(
                model, variables, str(tmp_path), out_channels=2,
                quantize="fp8",
            )

    @pytest.mark.parametrize("mode,naxes", [("mirror", 3), ("mirror-hw", 2)])
    def test_tta_matches_manual_flip_ensemble(
        self, model_and_vars, tmp_path, mode, naxes
    ):
        """tta='mirror'/'mirror-hw' must equal the hand-computed mean over
        all 2^k spatial-flip passes (each un-flipped back into place)."""
        from itertools import combinations

        import jax.numpy as jnp

        model, variables = model_and_vars
        x = np.random.RandomState(3).rand(2, 8, 64, 64, 1).astype(np.float32)
        pred = StandardPredictor(
            model, variables, str(tmp_path), out_channels=2, tta=mode
        )
        got = pred._predict_batch(x)

        axes = (1, 2, 3) if mode == "mirror" else (2, 3)
        assert len(axes) == naxes
        outs = []
        for r in range(len(axes) + 1):
            for c in combinations(axes, r):
                xa = jnp.flip(jnp.asarray(x), axis=list(c)) if c else jnp.asarray(x)
                o = model.apply(variables, xa, False)
                outs.append(np.asarray(jnp.flip(o, axis=list(c)) if c else o))
        want = np.mean(outs, axis=0)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        # sanity: the ensemble differs from the single-pass forward
        single = np.asarray(model.apply(variables, jnp.asarray(x), False))
        assert np.abs(want - single).max() > 1e-4

    def test_tta_e2e_volume_and_int8_composition(
        self, model_and_vars, volume_file, tmp_path
    ):
        """Full sliding-window pipeline with TTA on, composed with int8 PTQ
        (the flip ensemble runs inside the quant context; calibration
        threads its absmax collection through every flip pass)."""
        model, variables = model_and_vars
        out_t = str(tmp_path / "t")
        out_q = str(tmp_path / "q")
        os.makedirs(out_t), os.makedirs(out_q)
        ft = StandardPredictor(
            model, variables, out_t, out_channels=2, tta="mirror-hw"
        )(_loader(volume_file))
        with h5py.File(ft, "r") as f:
            a = f["predictions"][:]
        assert a.shape == (2, 16, 96, 96) and np.isfinite(a).all()
        fq = StandardPredictor(
            model, variables, out_q, out_channels=2, tta="mirror-hw",
            quantize="int8", calib_batches=1,
        )(_loader(volume_file))
        with h5py.File(fq, "r") as f:
            b = f["predictions"][:]
        assert np.isfinite(b).all()
        assert (a.argmax(0) == b.argmax(0)).mean() > 0.95

    def test_tta_2d_variant_model_z_squeeze(self, rng, tmp_path):
        """For 2D-variant models (UNet2D — the predictor squeezes z), TTA
        flips the post-squeeze H/W axes and re-expands the depth dim."""
        from itertools import combinations

        import jax.numpy as jnp

        model = get_model(
            {"name": "UNet2D", "in_channels": 1, "out_channels": 1,
             "f_maps": 8, "num_levels": 2}
        )
        variables = model.init(rng, jnp.zeros((1, 64, 64, 1)), False)
        x = np.random.RandomState(5).rand(2, 1, 64, 64, 1).astype(np.float32)
        pred = StandardPredictor(
            model, variables, str(tmp_path), out_channels=1, tta="mirror"
        )
        got = pred._predict_batch(x)

        x2d = jnp.asarray(x[:, 0])
        outs = []
        for r in range(3):
            for c in combinations((1, 2), r):
                xa = jnp.flip(x2d, axis=list(c)) if c else x2d
                o = model.apply(variables, xa, False)
                outs.append(np.asarray(jnp.flip(o, axis=list(c)) if c else o))
        want = np.mean(outs, axis=0)[:, None]
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_tta_rejects_unknown_mode_and_dsb(self, model_and_vars, tmp_path):
        model, variables = model_and_vars
        with pytest.raises(ValueError, match="tta"):
            StandardPredictor(
                model, variables, str(tmp_path), out_channels=2, tta="rot90"
            )
        with pytest.raises(ValueError, match="tta"):
            DSB2018Predictor(
                model, variables, str(tmp_path), tta="mirror"
            )

    def test_overlap_average_consistency(self, model_and_vars, volume_file, tmp_path):
        """Overlapping strides must give the same result as exact tiling for a
        deterministic model (averaging identical patch predictions in the
        interior of each patch)."""
        model, variables = model_and_vars
        out_dir_a = str(tmp_path / "a")
        out_dir_b = str(tmp_path / "b")
        os.makedirs(out_dir_a), os.makedirs(out_dir_b)
        fa = StandardPredictor(model, variables, out_dir_a, out_channels=2)(
            _loader(volume_file)
        )
        fb = StandardPredictor(model, variables, out_dir_b, out_channels=2)(
            _loader(volume_file, stride=[4, 32, 32])
        )
        with h5py.File(fa, "r") as f:
            a = f["predictions"][:]
        with h5py.File(fb, "r") as f:
            b = f["predictions"][:]
        assert a.shape == b.shape
        # overlapping averages won't be identical (each window sees different
        # context) but must agree strongly in the interior
        interior = (slice(None), slice(4, 12), slice(32, 64), slice(32, 64))
        assert np.corrcoef(a[interior].ravel(), b[interior].ravel())[0, 1] > 0.8

    def test_halo_stripped(self, model_and_vars, volume_file, tmp_path):
        model, variables = model_and_vars
        out = str(tmp_path / "halo")
        os.makedirs(out)
        f = StandardPredictor(model, variables, out, out_channels=2)(
            _loader(volume_file, halo=(2, 8, 8))
        )
        with h5py.File(f, "r") as h:
            result = h["predictions"][:]
        assert result.shape == (2, 16, 96, 96)
        assert np.isfinite(result).all()

    def test_save_segmentation(self, model_and_vars, volume_file, tmp_path):
        model, variables = model_and_vars
        out = str(tmp_path / "seg")
        os.makedirs(out)
        f = StandardPredictor(
            model, variables, out, out_channels=2, save_segmentation=True
        )(_loader(volume_file))
        with h5py.File(f, "r") as h:
            seg = h["predictions"][:]
        assert seg.dtype == np.uint16
        assert seg.shape == (16, 96, 96)
        assert set(np.unique(seg)) <= {0, 1}

    def test_prediction_channel(self, model_and_vars, volume_file, tmp_path):
        model, variables = model_and_vars
        out = str(tmp_path / "chan")
        os.makedirs(out)
        f = StandardPredictor(
            model, variables, out, out_channels=2, prediction_channel=1
        )(_loader(volume_file))
        with h5py.File(f, "r") as h:
            assert h["predictions"].shape == (1, 16, 96, 96)


class TestLazyPredictor:
    def test_matches_standard(self, model_and_vars, volume_file, tmp_path):
        model, variables = model_and_vars
        out_s = str(tmp_path / "std")
        out_l = str(tmp_path / "lazy")
        os.makedirs(out_s), os.makedirs(out_l)
        fs = StandardPredictor(model, variables, out_s, out_channels=2)(
            _loader(volume_file)
        )
        fl = LazyPredictor(model, variables, out_l, out_channels=2)(
            _loader(volume_file)
        )
        with h5py.File(fs, "r") as f:
            a = f["predictions"][:]
        with h5py.File(fl, "r") as f:
            b = f["predictions"][:]
            assert "normalization" not in f
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


class TestDSBPredictor:
    def test_per_image_outputs(self, rng, tmp_path):
        from PIL import Image

        from mdeical_image_segmentation_tpu.data import DSB2018Dataset, VolumeLoader

        root = tmp_path / "dsb"
        os.makedirs(root / "images")
        rs = np.random.RandomState(0)
        for i in range(3):
            Image.fromarray((rs.rand(64, 64) * 255).astype(np.uint8)).save(
                root / "images" / f"img{i}.png"
            )
        ds = DSB2018Dataset(
            str(root), "test",
            {"raw": [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}]},
        )
        model = get_model(
            {"name": "UNet2D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
             "num_levels": 2}
        )
        import jax.numpy as jnp

        variables = model.init(rng, jnp.zeros((1, 64, 64, 1)), False)
        out = tmp_path / "dsb_out"
        os.makedirs(out)
        loader = VolumeLoader(ds, batch_size=2, prefetch=0,
                              collate_fn=ds.prediction_collate)
        DSB2018Predictor(model, variables, str(out))(loader)
        outputs = sorted(os.listdir(out))
        assert len(outputs) == 3
        with h5py.File(out / outputs[0], "r") as f:
            assert "predictions" in f and "segmentation" in f
