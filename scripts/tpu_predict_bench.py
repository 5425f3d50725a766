"""3D sliding-window inference throughput on TPU (predict3d e2e).

Drives the full predictor stack — H5 test loader → halo-padded patches →
jitted batched forward (slab convs) → device overlap-add → H5 write — on a
synthetic volume at the reference's prediction geometry (patch [80,170,170]
stride==patch halo [16,32,32], configs/unet3d_predict.yml), f_maps=64.
Reports wall-clock voxels/sec and patches/sec.  Writes
/tmp/tpu_predict_bench.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import h5py
import numpy as np

OUT = {}


def log(k, v):
    OUT[k] = v
    print(json.dumps({k: v})[:500], flush=True)
    with open("/tmp/tpu_predict_bench.json", "w") as f:
        json.dump(OUT, f, indent=2)


def main():
    import jax
    import jax.numpy as jnp

    from mdeical_image_segmentation_tpu.data import get_test_loaders
    from mdeical_image_segmentation_tpu.infer import get_predictor
    from mdeical_image_segmentation_tpu.models import get_model

    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))

    workdir = "/tmp/predict_bench"
    os.makedirs(workdir, exist_ok=True)
    vol_shape = (160, 340, 340)  # 2x2x2 = 8 patches of [80,170,170]
    raw_path = os.path.join(workdir, "vol.h5")
    if not os.path.exists(raw_path):
        rs = np.random.RandomState(0)
        with h5py.File(raw_path, "w") as f:
            f.create_dataset("raw", data=rs.rand(*vol_shape).astype(np.float32))

    config = {
        "model": {"name": "UNet3D", "in_channels": 1, "out_channels": 1,
                  "f_maps": 64, "num_levels": 4, "layer_order": "gcr",
                  "final_sigmoid": True, "dtype": jnp.bfloat16},
        "output_dir": workdir,
        "predictor": {"name": "StandardPredictor",
                      "accumulate_on_device": True},
        "loaders": {
            "dataset": "StandardHDF5Dataset",
            # b4 at this geometry OOMs v5e (41.5 GB > 15.75 GB hbm): the
            # halo-padded (112, 234, 234) f64 forward is ~10 GB per patch
            "batch_size": int(os.environ.get("PRED_BATCH", 1)),
            "raw_internal_path": "raw",
            "test": {
                "file_paths": [raw_path],
                "slice_builder": {
                    "name": "SliceBuilder",
                    "patch_shape": [80, 170, 170],
                    "stride_shape": [80, 170, 170],
                    "halo_shape": [16, 32, 32],
                },
                "transformer": {
                    "raw": [{"name": "Standardize"},
                            {"name": "ToTensor", "expand_dims": True}],
                },
            },
        },
    }

    model = get_model(dict(config["model"]))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 32, 1), jnp.float32),
        False,
    )

    predictor = get_predictor(model, variables, workdir, config)
    loaders = list(get_test_loaders(config))
    t0 = time.time()
    for loader in loaders:
        predictor(loader)
    wall = time.time() - t0
    n_vox = int(np.prod(vol_shape))
    log("first_run_s", round(wall, 2))

    # second run: compile cached, steady-state throughput
    predictor2 = get_predictor(model, variables, workdir, config)
    loaders = list(get_test_loaders(config))
    t0 = time.time()
    for loader in loaders:
        predictor2(loader)
    wall = time.time() - t0
    log("steady_run_s", round(wall, 2))
    log("mvoxels_per_sec", round(n_vox / wall / 1e6, 1))
    log("patches_per_sec", round(8 / wall, 2))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
