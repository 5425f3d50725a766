"""North-star convergence parity leg ON-CHIP (VERDICT r4 item 7).

The 0.5% dice-parity bar (BASELINE.md: "Dice within 0.5% of the PyTorch
ref") has so far been recorded from the CPU-mesh pytest leg only.  This
session runs the exact NORTHSTAR configuration from tests/test_train_parity
— 200 steps at 32², matched torch init / batch order / AdamW + HF schedule
+ grad clip — with the tpuseg side on the REAL TPU (1-chip mesh) and the
torch reference loop on host CPU, and records the dice/IoU pair for
PARITY.md.  This is the durable on-hardware artifact: the claim no longer
depends on the XLA:CPU backend's numerics standing in for the TPU's.

Reference trainer semantics matched: /root/reference/train.py:120-137.

Writes /tmp/tpu_r5_northstar.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = {}


def log(k, v):
    OUT[k] = v
    print(json.dumps({k: v})[:1200], flush=True)
    with open("/tmp/tpu_r5_northstar.json", "w") as f:
        json.dump(OUT, f, indent=2)


def main():
    import jax

    log("devices", str(jax.devices()))
    log("platform", jax.devices()[0].platform)

    from tests.test_train_parity import NORTHSTAR, _run_torch, _run_tpuseg
    from mdeical_image_segmentation_tpu.metrics.metrics2d import (
        compute_metrics,
    )

    t0 = time.time()
    init_sd, torch_losses, eval_logits, eval_labels = _run_torch(NORTHSTAR)
    torch_metrics = compute_metrics(eval_logits, eval_labels, threshold=None)
    log("torch", {
        "wall_s": round(time.time() - t0, 1),
        "final_loss": round(torch_losses[-1], 5),
        "dice": round(torch_metrics["dice"], 5),
        "iou": round(torch_metrics["iou"], 5),
    })

    out_dir = "/tmp/tpu_r5_northstar_run"
    t0 = time.time()
    _, metrics, jax_losses = _run_tpuseg(NORTHSTAR, init_sd, out_dir,
                                         n_devices=1)
    log("tpuseg_on_tpu", {
        "wall_s": round(time.time() - t0, 1),
        "final_loss": round(jax_losses[-1], 5),
        "dice": round(metrics["eval_dice"], 5),
        "iou": round(metrics["eval_iou"], 5),
    })

    d_gap = abs(metrics["eval_dice"] - torch_metrics["dice"]) / torch_metrics["dice"]
    i_gap = abs(metrics["eval_iou"] - torch_metrics["iou"]) / torch_metrics["iou"]
    log("gaps", {
        "dice_rel_pct": round(d_gap * 100, 3),
        "iou_rel_pct": round(i_gap * 100, 3),
        "within_half_percent": bool(d_gap < 5e-3),
    })
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
