"""TPU convergence + input-pipeline session.

1. Trains a UNet on the synthetic blob task through the REAL training stack
   (Trainer: host loader → device prefetch → on-device augmentation → jitted
   step) for 600 steps on the TPU and reports eval Dice/IoU — the end-to-end
   learning demonstration on hardware.
2. Measures host-side loader throughput standalone to show the input
   pipeline sustains the device rate (north star: never starve the device).

Writes /tmp/tpu_convergence.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {}


def log(k, v):
    RESULTS[k] = v
    print(json.dumps({k: v}), flush=True)
    with open("/tmp/tpu_convergence.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def main():
    import numpy as np

    from mdeical_image_segmentation_tpu.data import (
        BatchLoader,
        SyntheticSliceDataset,
    )

    # host loader throughput (cached samples, threaded assembly)
    ds = SyntheticSliceDataset(n_samples=512, resolution=256)
    loader = BatchLoader(ds, 32, shuffle=True, prefetch=2, num_workers=8)
    for _ in loader:  # warm the cache
        pass
    t0 = time.time()
    n = 0
    for batch in loader:
        n += batch["images"].shape[0]
    dt = time.time() - t0
    log("host_loader_slices_per_sec", round(n / dt, 1))

    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel
    from mdeical_image_segmentation_tpu.train import Trainer, TrainingArguments

    train_ds = SyntheticSliceDataset(n_samples=512, resolution=256)
    eval_ds = SyntheticSliceDataset(n_samples=64, resolution=256, seed=7)
    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                   base_features=16, compute_dtype="bfloat16")
    )
    args = TrainingArguments(
        output_dir="/tmp/tpu_convergence_out",
        max_steps=600,
        per_device_train_batch_size=32,
        per_device_eval_batch_size=32,
        eval_strategy="no",
        logging_steps=100,
        save_steps=0,
        learning_rate=3e-3,
        eval_threshold=0.5,
    )
    trainer = Trainer(model, args, train_ds, eval_ds)
    t0 = time.time()
    out = trainer.train()
    train_time = time.time() - t0
    metrics = trainer.evaluate()
    log("train_600_steps", {
        "wall_s": round(train_time, 1),
        "slices_per_sec_e2e": round(600 * 32 / train_time, 1),
        "final_train_loss": round(out.training_loss, 4),
        "eval_dice": round(metrics["eval_dice"], 4),
        "eval_iou": round(metrics["eval_iou"], 4),
    })
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
