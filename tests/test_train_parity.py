"""Training-trajectory accuracy parity vs the torch reference (the accuracy
half of the BASELINE north star: "Dice within 0.5% of the PyTorch ref").

No DRIVE data exists in this environment, so both stacks train on the same
fixed synthetic DRIVE-shaped dataset with matched init (utils.torch_import),
matched optimizer (AdamW + the HF linear warmup→decay schedule + the HF
default global grad-norm clip of 1.0 the reference trainer uses —
train.py:120-137), identical batch order (our deterministic BatchLoader
drives both), and the same BCE-with-logits loss the reference's UNetModel
applies for out_channels=1 (reference model/unet2d/unet.py:1186).

The torch side is an explicit loop with exactly the reference trainer's
per-step semantics rather than an HF Trainer instance (whose torch-generator
sampler cannot be seed-matched to a JAX loader); the tpuseg side is the real
``Trainer``.

Why THREE legs (measured root cause, /tmp/parity_diag*.log sessions):
training this task traverses a loss cliff (the step where the model commits
to the blob/background decision), and chaos there amplifies benign fp drift
between two bitwise-different stacks — at LR 1e-3 both stacks spike at the
SAME step 7 (torch 1.78, jax 2.00) from a 1.2e-3 loss gap at step 6, after
which the trajectories decohere.  No pointwise tolerance survives that and
still means anything, so parity is pinned where it is well-defined:

1. ``short``  — a smooth 10-step horizon (LR 5e-4): stepwise losses agree
   to ≲1e-2 (first three steps to 1e-4), mean to <1%.
2. ``converged`` — 80 steps at 16², past the cliff: both stacks settle to
   the same solution; dice gap measured 0.57% at dice≈0.92 (mid
   convergence — the gap shrinks as training converges, see below).
3. ``northstar`` (env-gated ``TPUSEG_NORTHSTAR=1``, ~30 min on the CPU
   mesh) — 200 steps at 32² to dice≈0.98, where the measured gap is
   0.19% — inside the 0.5% north-star bar.  Recorded in PARITY.md; gated
   because the jitted CPU-mesh step costs ~5-7 s at ANY resolution (XLA
   CPU conv efficiency), so full convergence is a wall-clock outlier.
"""

import os
import sys

import numpy as np
import pytest

import jax

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE),
    reason="torch reference checkout not available",
)

WD = 1e-3
BATCH = 8

SHORT = dict(lr=5e-4, steps=10, res=64, n_train=16, n_eval=8)
CONVERGED = dict(lr=2e-3, steps=80, res=16, n_train=32, n_eval=8)
# the un-gated 0.5%-bar leg: deeper convergence at 16², run on a 1-device
# mesh (identical math for the norm-free classic UNet, ~5x less
# virtual-device dispatch overhead per step)
NORTHSTAR16 = dict(lr=2e-3, steps=200, res=16, n_train=32, n_eval=8)
NORTHSTAR = dict(lr=1e-3, steps=200, res=32, n_train=32, n_eval=8)


def _datasets(cfg):
    from mdeical_image_segmentation_tpu.data import SyntheticSliceDataset

    train = SyntheticSliceDataset(
        n_samples=cfg["n_train"], resolution=cfg["res"], channels=3
    )
    evals = SyntheticSliceDataset(
        n_samples=cfg["n_eval"], resolution=cfg["res"], channels=3, seed=7
    )
    return train, evals


def _batches(train_ds, steps, seed):
    """The exact batch sequence our Trainer consumes (drop-last shuffle)."""
    from mdeical_image_segmentation_tpu.data.collate import BatchLoader

    loader = BatchLoader(train_ds, BATCH, shuffle=True, seed=seed, prefetch=0)
    next(iter(loader))  # the Trainer peeks one epoch for state init
    out = []
    while len(out) < steps:
        for batch in loader:
            out.append(batch)
            if len(out) == steps:
                break
    return out


def _hf_lr_lambda(steps):
    """HF get_linear_schedule_with_warmup(num_warmup_steps=0) as a torch
    LambdaLR multiplier: FULL LR at step 0, linear decay to 0 at ``steps``
    — the same curve the tpuseg trainer's zero-warmup branch emits
    (optax.linear_schedule(lr, 0.0, steps) evaluated at the optimizer's
    update count)."""

    def sched(step):
        return max(0.0, 1.0 - step / max(steps, 1))

    return sched


def _run_torch(cfg):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.test_torch_parity import _install_2d_stubs

    _install_2d_stubs()
    import torch

    sys.path.insert(0, REFERENCE)
    try:
        from model.unet2d.unet import UNet as TorchUNet
    finally:
        sys.path.remove(REFERENCE)

    torch.manual_seed(0)
    model = TorchUNet(3, 1)
    init_sd = {k: v.detach().clone() for k, v in model.state_dict().items()}

    opt = torch.optim.AdamW(
        model.parameters(), lr=cfg["lr"], betas=(0.9, 0.999), eps=1e-8,
        weight_decay=WD,
    )
    sched = torch.optim.lr_scheduler.LambdaLR(opt, _hf_lr_lambda(cfg["steps"]))
    criterion = torch.nn.BCEWithLogitsLoss()

    train_ds, eval_ds = _datasets(cfg)
    losses = []
    model.train()
    for batch in _batches(train_ds, cfg["steps"], seed=42):
        x = torch.from_numpy(np.moveaxis(batch["images"], -1, 1).copy())
        y = torch.from_numpy(np.moveaxis(batch["labels"], -1, 1).copy())
        opt.zero_grad()
        loss = criterion(model(x), y)
        loss.backward()
        # HF Trainer clips the global grad norm to max_grad_norm=1.0 by
        # default and the reference never overrides it — the tpuseg side
        # clips identically (TrainingArguments.max_grad_norm)
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        sched.step()
        losses.append(float(loss.detach()))

    model.eval()
    with torch.no_grad():
        logits = []
        for i in range(cfg["n_eval"]):
            s = eval_ds[i]
            x = torch.from_numpy(np.moveaxis(s["image"][None], -1, 1).copy())
            logits.append(model(x).numpy())
    eval_logits = np.moveaxis(np.concatenate(logits), 1, -1)
    eval_labels = np.stack([eval_ds[i]["mask"] for i in range(cfg["n_eval"])])
    return init_sd, losses, eval_logits, eval_labels


class _LossTap:
    """Trainer callback capturing the per-step loss stream."""

    def __init__(self):
        self.losses = []

    def on_log(self, args, state, control, logs):
        if "loss" in logs:
            self.losses.append(logs["loss"])

    def __getattr__(self, name):
        return lambda *a, **k: None


def _run_tpuseg(cfg, init_sd, out_dir, n_devices: int = 8):
    """The real tpuseg Trainer from the torch init on the same batches.

    ``n_devices=1`` runs the same global-batch math on a single-device
    mesh — the per-step wall cost on the virtual CPU mesh is dominated by
    8-way dispatch/collective overhead at these tiny resolutions (~5 s vs
    ~1 s), and the long converged legs only assert end-state quality."""
    import jax as _jax

    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel
    from mdeical_image_segmentation_tpu.parallel import mesh as mesh_lib
    from mdeical_image_segmentation_tpu.train import Trainer, TrainingArguments
    from mdeical_image_segmentation_tpu.utils.torch_import import (
        unet_params_from_torch,
    )

    train_ds, eval_ds = _datasets(cfg)
    model = UNetModel(UNetConfig(in_channels=3, out_channels=1, unet_type="UNet"))
    args = TrainingArguments(
        output_dir=out_dir,
        max_steps=cfg["steps"],
        per_device_train_batch_size=BATCH // n_devices,
        per_device_eval_batch_size=BATCH // n_devices,
        learning_rate=cfg["lr"],
        weight_decay=WD,
        warmup_ratio=0.0,
        eval_strategy="no",
        logging_steps=1,
        save_steps=0,
        augment=False,
        seed=42,
    )
    tap = _LossTap()
    mesh = mesh_lib.make_mesh(devices=_jax.devices()[:n_devices])
    trainer = Trainer(model, args, train_ds, eval_ds, callbacks=[tap],
                      mesh=mesh)
    # seed the trainer with the torch init instead of the flax init
    first = train_ds[0]["image"][None]
    trainer._init_state(first, cfg["steps"])
    trainer._compile_steps()
    variables = unet_params_from_torch(
        {k: v.numpy() for k, v in init_sd.items()}
    )
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), variables["params"]
    )
    trainer.state = trainer.state.replace(
        params=mesh_lib.replicate(trainer.mesh, params)
    )
    result = trainer.train()
    metrics = trainer.evaluate()
    return result, metrics, tap.losses


@pytest.fixture(scope="module")
def short_runs(tmp_path_factory):
    init_sd, losses, _, _ = _run_torch(SHORT)
    # 1-device mesh, same global batch (per_device = BATCH // n_devices):
    # identical math to the 8-device mesh — the classic UNet has no batch
    # statistics, so the mesh width only changes dispatch overhead (~5x at
    # these tiny shapes; this fixture was the default tier's single largest
    # setup at 187 s).  8-device trainer dispatch is covered by
    # test_trainer2d::test_uses_all_devices.
    result, _, jax_losses = _run_tpuseg(
        SHORT, init_sd, str(tmp_path_factory.mktemp("parity_short")),
        n_devices=1,
    )
    return losses, jax_losses, result


@pytest.fixture(scope="module")
def converged_runs(tmp_path_factory):
    init_sd, _, eval_logits, eval_labels = _run_torch(CONVERGED)
    # 1-device mesh: identical math (no batch statistics in the classic
    # UNet), ~5x cheaper per step than the 8-device virtual mesh
    _, metrics, _ = _run_tpuseg(
        CONVERGED, init_sd, str(tmp_path_factory.mktemp("parity_conv")),
        n_devices=1,
    )
    return eval_logits, eval_labels, metrics


def test_stepwise_loss_parity(short_runs):
    """Smooth-regime trajectory parity: the strongest matched-dynamics claim.

    Measured margins (parity_diag3): steps 1-3 identical to 1e-6, drift
    grows to 1.2e-2 by step 10; bands assert ~2x those."""
    torch_losses, jax_losses, _ = short_runs
    assert len(jax_losses) == len(torch_losses) == SHORT["steps"]
    for t, j in zip(torch_losses[:3], jax_losses[:3]):
        assert abs(t - j) < 1e-4, (t, j)
    for i, (t, j) in enumerate(zip(torch_losses, jax_losses)):
        assert abs(t - j) < 2.5e-2, (i + 1, t, j)


def test_mean_loss_matches_torch_trainer(short_runs):
    torch_losses, _, result = short_runs
    torch_mean = float(np.mean(torch_losses))
    # measured gap 0.42%; assert <1%
    assert result.training_loss == pytest.approx(torch_mean, rel=1e-2), (
        result.training_loss,
        torch_mean,
    )


@pytest.mark.parity
def test_converged_dice_tracks_torch(converged_runs):
    """Mid-convergence (dice≈0.92) quality parity; measured gap 0.57%.

    The gap closes with convergence depth (0.19% at dice 0.98 — the
    north-star leg below); this leg pins 1.5%.  Parity tier (round-4
    durations profile: its 80-step torch+jax fixture costs ~4 min of the
    default run, and the deeper 200-step leg below subsumes its claim —
    /verify and nightly run both)."""
    from mdeical_image_segmentation_tpu.metrics.metrics2d import compute_metrics

    eval_logits, eval_labels, metrics = converged_runs
    torch_metrics = compute_metrics(eval_logits, eval_labels, threshold=None)
    assert torch_metrics["dice"] > 0.85  # both actually learned the task
    assert metrics["eval_dice"] > 0.85
    assert metrics["eval_dice"] == pytest.approx(
        torch_metrics["dice"], rel=1.5e-2
    ), (metrics["eval_dice"], torch_metrics["dice"])
    assert metrics["eval_iou"] == pytest.approx(
        torch_metrics["iou"], rel=2.5e-2
    ), (metrics["eval_iou"], torch_metrics["iou"])


@pytest.mark.parity
def test_converged_dice_within_half_percent_of_torch(tmp_path_factory):
    """The 0.5% north-star accuracy bar (round-3 item 5; `-m parity` tier).

    Deselected from the default run (pyproject addopts) to keep the suite
    under ~25 min, but ALWAYS run by /verify and nightly via
    ``pytest -m parity`` — round 3's lesson is that a skipped slow parity
    leg let a trainer-semantics regression land (commit 9452d1f).

    Deeper convergence than test_converged_dice_tracks_torch (200 steps at
    16², dice≈0.96): the stacks' dice gap closes with convergence depth —
    measured 0.061% here vs 0.57% at the 80-step leg.  A 1-device mesh
    keeps the leg to a few minutes (the 8-device virtual mesh costs ~5 s
    per step in dispatch overhead at this tiny resolution; the math is
    identical for the norm-free classic UNet — no batch statistics)."""
    from mdeical_image_segmentation_tpu.metrics.metrics2d import compute_metrics

    init_sd, _, eval_logits, eval_labels = _run_torch(NORTHSTAR16)
    _, metrics, _ = _run_tpuseg(
        NORTHSTAR16, init_sd, str(tmp_path_factory.mktemp("parity_ns16")),
        n_devices=1,
    )
    torch_metrics = compute_metrics(eval_logits, eval_labels, threshold=None)
    assert torch_metrics["dice"] > 0.9  # genuinely converged
    assert metrics["eval_dice"] == pytest.approx(
        torch_metrics["dice"], rel=5e-3
    ), (metrics["eval_dice"], torch_metrics["dice"])
    assert metrics["eval_iou"] == pytest.approx(
        torch_metrics["iou"], rel=1e-2
    ), (metrics["eval_iou"], torch_metrics["iou"])


@pytest.mark.parity
@pytest.mark.skipif(
    not os.environ.get("TPUSEG_NORTHSTAR"),
    reason="full-convergence leg (~30 min on the CPU mesh); "
    "set TPUSEG_NORTHSTAR=1 — measured result recorded in PARITY.md",
)
def test_final_dice_within_half_percent_of_torch(tmp_path_factory):
    """The north-star accuracy criterion at full convergence (dice≈0.98).

    Measured 2026-08-16 (parity_diag200): torch dice 0.97901 vs tpuseg
    0.97715 → 0.19% gap; iou 0.95927 vs 0.95582 → 0.36%."""
    from mdeical_image_segmentation_tpu.metrics.metrics2d import compute_metrics

    init_sd, _, eval_logits, eval_labels = _run_torch(NORTHSTAR)
    _, metrics, _ = _run_tpuseg(
        NORTHSTAR, init_sd, str(tmp_path_factory.mktemp("parity_ns"))
    )
    torch_metrics = compute_metrics(eval_logits, eval_labels, threshold=None)
    assert torch_metrics["dice"] > 0.95
    assert metrics["eval_dice"] == pytest.approx(
        torch_metrics["dice"], rel=5e-3
    ), (metrics["eval_dice"], torch_metrics["dice"])
    assert metrics["eval_iou"] == pytest.approx(
        torch_metrics["iou"], rel=1e-2
    ), (metrics["eval_iou"], torch_metrics["iou"])
