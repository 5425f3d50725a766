"""Round-3 item 5: find a converged-leg config whose dice gap vs torch is
inside the 0.5% north-star bar in a few minutes on the CPU mesh.

Reuses the test harness (tests/test_train_parity.py) and sweeps depth at
16² (the cheap resolution): the measured claim is that the gap closes
with convergence depth (0.57% at 80 steps/dice 0.92 → 0.19% at the gated
200-step/32² leg).  Prints per-config: wall seconds, torch dice, tpuseg
dice, relative gap.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

from tests.test_train_parity import _run_torch, _run_tpuseg  # noqa: E402
from mdeical_image_segmentation_tpu.metrics.metrics2d import (  # noqa: E402
    compute_metrics)


def trial(name, cfg, outdir, n_devices=1):
    t0 = time.time()
    init_sd, _, eval_logits, eval_labels = _run_torch(cfg)
    t_torch = time.time() - t0
    t0 = time.time()
    _, metrics, _ = _run_tpuseg(cfg, init_sd, outdir, n_devices=n_devices)
    t_jax = time.time() - t0
    tm = compute_metrics(eval_logits, eval_labels, threshold=None)
    gap = abs(metrics["eval_dice"] - tm["dice"]) / tm["dice"]
    print(
        f"{name}: torch_dice={tm['dice']:.5f} jax_dice="
        f"{metrics['eval_dice']:.5f} rel_gap={gap * 100:.3f}% "
        f"(torch {t_torch:.0f}s, jax {t_jax:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    import tempfile

    base = dict(lr=2e-3, res=16, n_train=32, n_eval=8)
    for steps in (120, 160, 200):
        cfg = dict(base, steps=steps)
        trial(f"s{steps}_r16_dev1", cfg, tempfile.mkdtemp(), n_devices=1)
