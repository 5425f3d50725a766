"""int8 PTQ fidelity on a TRAINED 3D model (VERDICT r4 item 6).

The round-3/4 int8 evidence rests on random-init logits (sign-agreement
0.92-0.95, flagged noisy in PERF.md's own footnote).  This session replaces
that bound with the quantity a user cares about: the **dice delta** between
the calibrated int8 predictor and the float predictor on a model actually
trained to convergence, evaluated on a held-out volume.

Pipeline (everything the real stack: trainer3d + StandardPredictor):
1. synthesize blobby train/val/test H5 volumes (gaussian spheres + noise —
   a geometric task, not pointwise thresholding, so quantization error has
   structure to disturb);
2. train UNet3D f32 via create_trainer with the device_cache fast path
   (~400 iterations, a couple of minutes on the chip);
3. predict the held-out volume twice from the best checkpoint — float and
   ``quantize: int8`` (calibrated on the first 2 patch batches) — through
   the sliding-window overlap-add path;
4. report dice(float, GT), dice(int8, GT), the delta, and voxel mask
   agreement between the two predictions.

Reference predictor being matched: /root/reference/model/unet3d/predictor.py:85-155
(the reference has no quantized path — this grounds the TPU extension).

Writes /tmp/tpu_r5_int8_fidelity.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import h5py
import numpy as np

OUT = {}
ROOT = "/tmp/tpu_r5_int8"


def log(k, v):
    OUT[k] = v
    print(json.dumps({k: v})[:1500], flush=True)
    with open("/tmp/tpu_r5_int8_fidelity.json", "w") as f:
        json.dump(OUT, f, indent=2)


def make_volume(path, shape, n_blobs, seed):
    """Gaussian-sphere phantom: raw = soft blobs + noise, label = blob>0.5."""
    rs = np.random.RandomState(seed)
    D, H, W = shape
    zz, yy, xx = np.meshgrid(
        np.arange(D), np.arange(H), np.arange(W), indexing="ij")
    field = np.zeros(shape, np.float32)
    for _ in range(n_blobs):
        c = rs.rand(3) * [D, H, W]
        r = rs.uniform(4.0, 10.0)
        d2 = ((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2) / r**2
        field = np.maximum(field, np.exp(-d2).astype(np.float32))
    label = (field > 0.5).astype(np.uint8)
    raw = field + rs.randn(*shape).astype(np.float32) * 0.25
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=raw)
        f.create_dataset("label", data=label)
    return label


def _phase(fp, patch, stride):
    return {
        "transformer": {
            "raw": [{"name": "Standardize"},
                    {"name": "ToTensor", "expand_dims": True}],
            "label": [{"name": "ToTensor", "expand_dims": True}],
        },
        "slice_builder": {"name": "SliceBuilder", "patch_shape": patch,
                          "stride_shape": stride, "skip_shape_check": True},
        "file_paths": [fp],
    }


def dice(pred, gt):
    inter = float(np.logical_and(pred, gt).sum())
    return 2 * inter / max(float(pred.sum() + gt.sum()), 1.0)


def main():
    import jax

    log("devices", str(jax.devices()))
    t0 = time.time()
    import jax.numpy as jnp

    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))

    os.makedirs(ROOT, exist_ok=True)
    vol = (48, 96, 96)
    make_volume(f"{ROOT}/train.h5", vol, 24, seed=0)
    make_volume(f"{ROOT}/val.h5", vol, 24, seed=1)
    gt = make_volume(f"{ROOT}/test.h5", vol, 24, seed=2)
    log("volumes", {"shape": vol, "test_fg_frac": round(float(gt.mean()), 4)})

    from mdeical_image_segmentation_tpu.train.trainer3d import create_trainer

    patch = [32, 64, 64]
    cfg = {
        "model": {"name": "UNet3D", "in_channels": 1, "out_channels": 1,
                  "f_maps": 32, "num_levels": 3, "layer_order": "gcr",
                  "final_sigmoid": True},
        "loss": {"name": "BCEDiceLoss"},
        "eval_metric": {"name": "DiceCoefficient"},
        "optimizer": {"name": "Adam", "learning_rate": 2e-3},
        "lr_scheduler": {"name": "ReduceLROnPlateau", "mode": "max",
                         "factor": 0.5, "patience": 6},
        "trainer": {"checkpoint_dir": f"{ROOT}/ckpt", "max_num_epochs": 1000,
                    "max_num_iterations": 400, "validate_after_iters": 100,
                    "log_after_iters": 50},
        "loaders": {"dataset": "StandardHDF5Dataset", "batch_size": 2,
                    "device_cache": True,
                    "train": _phase(f"{ROOT}/train.h5", patch, [16, 32, 32]),
                    "val": _phase(f"{ROOT}/val.h5", patch, patch)},
    }
    t0 = time.time()
    trainer = create_trainer(cfg)
    trainer.fit()
    log("train", {"wall_s": round(time.time() - t0, 1),
                  "iterations": trainer.num_iterations,
                  "best_val_dice": round(float(trainer.best_eval_score), 4)})

    # --- sliding-window prediction, float vs int8, from the best ckpt ---
    from mdeical_image_segmentation_tpu.data import get_test_loaders
    from mdeical_image_segmentation_tpu.infer import get_predictor
    from mdeical_image_segmentation_tpu.models import get_model
    from mdeical_image_segmentation_tpu.train import load_checkpoint

    state = load_checkpoint(f"{ROOT}/ckpt/best_checkpoint.msgpack")
    ms = state["model_state_dict"]
    variables = {"params": ms["params"]}
    if ms.get("batch_stats"):
        variables["batch_stats"] = ms["batch_stats"]
    model = get_model(cfg["model"])

    preds = {}
    for tag, predictor_cfg in (
        ("float", {"apply_activation": True}),
        ("int8", {"apply_activation": True, "quantize": "int8",
                  "calib_batches": 2}),
    ):
        out_dir = f"{ROOT}/pred_{tag}"
        os.makedirs(out_dir, exist_ok=True)
        pcfg = {
            "model": cfg["model"],
            "predictor": dict(predictor_cfg, name="StandardPredictor"),
            "loaders": {
                "dataset": "StandardHDF5Dataset", "batch_size": 2,
                "test": _phase(f"{ROOT}/test.h5", patch, [16, 32, 32]),
            },
        }
        pcfg["loaders"]["test"]["slice_builder"]["halo_shape"] = [8, 16, 16]
        t0 = time.time()
        predictor = get_predictor(model, variables, out_dir, pcfg)
        for loader in get_test_loaders(pcfg):
            predictor(loader)
        wall = time.time() - t0
        with h5py.File(f"{out_dir}/test_predictions.h5", "r") as f:
            prob = f["predictions"][:]
        mask = (prob[0] if prob.ndim == 4 else prob) > 0.5
        preds[tag] = mask
        log(f"pred_{tag}", {"wall_s": round(wall, 1),
                            "dice_vs_gt": round(dice(mask, gt), 5),
                            "fg_frac": round(float(mask.mean()), 4)})

    d_f = dice(preds["float"], gt)
    d_q = dice(preds["int8"], gt)
    log("fidelity", {
        "dice_float": round(d_f, 5),
        "dice_int8": round(d_q, 5),
        "dice_delta": round(d_f - d_q, 5),
        "dice_delta_rel_pct": round((d_f - d_q) / max(d_f, 1e-9) * 100, 3),
        "mask_agreement": round(
            float((preds["float"] == preds["int8"]).mean()), 5),
    })
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
