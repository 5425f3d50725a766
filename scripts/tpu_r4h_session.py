"""Round-4h TPU session: device_cache A/B through the FULL 3D trainer.

``loaders: {device_cache: true}`` (data/device_cache.py) keeps the train
volumes HBM-resident and moves only int32 patch coordinates per step; the
host path streams every patch through the tunnel (~0.5-1 s/step under
load, PERF.md "End-to-end training").  This measures both arms through
the real ``UNetTrainer.fit`` loop (loss fetched every step = honest sync):

  arm A  host loader (StandardHDF5Dataset -> VolumeLoader -> H2D prefetch)
  arm B  device_cache (jitted coordinate sampler, no per-step H2D)

Same model (UNet3D 'gcr' f32), same patch grid (64x128x128, b2), same
synthetic volumes.  First epoch of each arm is compile/warmup and is
excluded; epochs 2-4 are timed.

Usage: timeout 3000 python scripts/tpu_r4h_session.py | tee /tmp/r4h.json
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets up the persistent compile cache)


def _make_volumes(root):
    import h5py
    import numpy as np

    rs = np.random.RandomState(0)
    paths = {}
    for name, nz in (("train", 128), ("val", 64)):
        p = os.path.join(root, f"{name}.h5")
        raw = rs.rand(nz, 256, 256).astype(np.float32)
        with h5py.File(p, "w") as f:
            f.create_dataset("raw", data=raw)
            f.create_dataset("label", data=(raw > 0.6).astype(np.uint8))
        paths[name] = p
    return paths


def _config(paths, ckpt, device_cache):
    phase = lambda fp: {
        "transformer": {
            "raw": [
                {"name": "Standardize"},
                {"name": "RandomFlip"},
                {"name": "ToTensor", "expand_dims": True},
            ],
            "label": [
                {"name": "RandomFlip"},
                {"name": "ToTensor", "expand_dims": True},
            ],
        },
        "slice_builder": {
            "name": "SliceBuilder",
            "patch_shape": [64, 128, 128],
            "stride_shape": [64, 128, 128],
            "skip_shape_check": True,
        },
        "file_paths": [fp],
    }
    return {
        "model": {"name": "UNet3D", "in_channels": 1, "out_channels": 1,
                  "f_maps": 32, "num_levels": 4, "layer_order": "gcr",
                  "num_groups": 8, "final_sigmoid": True},
        "loss": {"name": "BCEDiceLoss"},
        "eval_metric": {"name": "MeanIoU"},
        "optimizer": {"name": "Adam", "learning_rate": 2e-4},
        "trainer": {"checkpoint_dir": ckpt, "max_num_epochs": 10**6,
                    "max_num_iterations": 10**9,
                    "validate_after_iters": 10**9,
                    "log_after_iters": 10**9,
                    "skip_train_validation": True},
        "loaders": {"dataset": "StandardHDF5Dataset", "batch_size": 2,
                    "num_workers": 4, "device_cache": bool(device_cache),
                    "train": phase(paths["train"]),
                    "val": phase(paths["val"])},
    }


def run():
    from mdeical_image_segmentation_tpu.train.trainer3d import create_trainer

    out = {}
    with tempfile.TemporaryDirectory() as root:
        paths = _make_volumes(root)
        for label, cache in (("host_loader", False), ("device_cache", True)):
            trainer = create_trainer(
                _config(paths, os.path.join(root, f"ck_{label}"), cache)
            )
            used_cache = getattr(
                trainer.loaders["train"], "is_device_cached", False
            )
            trainer.train()  # epoch 0: compile + warmup (excluded)
            t0 = time.time()
            steps0 = trainer.num_iterations
            for _ in range(3):
                trainer.train()
            dt = time.time() - t0
            steps = trainer.num_iterations - steps0
            out[label] = {
                "is_device_cached": used_cache,
                "steps": steps,
                "ms_per_step": dt / steps * 1e3,
                "patches_per_sec": steps * 2 / dt,
            }
            print(json.dumps({label: out[label]}), flush=True)
    if out["host_loader"]["ms_per_step"] > 0:
        out["speedup"] = (
            out["host_loader"]["ms_per_step"]
            / out["device_cache"]["ms_per_step"]
        )
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    run()
