"""Training-trajectory accuracy parity vs the torch reference (the accuracy
half of the BASELINE north star: "Dice within 0.5% of the PyTorch ref").

No DRIVE data exists in this environment, so both stacks train on the same
fixed synthetic DRIVE-shaped dataset with matched init (utils.torch_import),
matched optimizer (AdamW + the HF linear warmup→decay schedule the reference
trainer uses — train.py:120-137), identical batch order (our deterministic
BatchLoader drives both), and the same BCE-with-logits loss the reference's
UNetModel applies for out_channels=1 (reference model/unet2d/unet.py:1186).

The torch side is an explicit loop with exactly the reference trainer's
per-step semantics rather than an HF Trainer instance (whose torch-generator
sampler cannot be seed-matched to a JAX loader); the tpuseg side is the real
``Trainer``.
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

LR = 1e-3
WD = 1e-3
STEPS = 20
BATCH = 8
RES = 64
N_TRAIN, N_EVAL = 16, 8


def _datasets():
    from mdeical_image_segmentation_tpu.data import SyntheticSliceDataset

    train = SyntheticSliceDataset(n_samples=N_TRAIN, resolution=RES, channels=3)
    evals = SyntheticSliceDataset(
        n_samples=N_EVAL, resolution=RES, channels=3, seed=7
    )
    return train, evals


def _batches(train_ds, seed):
    """The exact batch sequence our Trainer consumes (drop-last shuffle)."""
    from mdeical_image_segmentation_tpu.data.collate import BatchLoader

    loader = BatchLoader(train_ds, BATCH, shuffle=True, seed=seed, prefetch=0)
    next(iter(loader))  # the Trainer peeks one epoch for state init
    out = []
    while len(out) < STEPS:
        for batch in loader:
            out.append(batch)
            if len(out) == STEPS:
                break
    return out


def _hf_lr_lambda(step):
    """optax join_schedules([linear(0→lr, 1), linear(lr→0, STEPS-1)], [1]) as
    a torch LambdaLR multiplier (warmup_ratio=0 → 1-step warmup floor)."""
    if step < 1:
        return 0.0
    return max(0.0, 1.0 - (step - 1) / max(STEPS - 1, 1))


@pytest.fixture(scope="module")
def torch_run():
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
        model.parameters(), lr=LR, betas=(0.9, 0.999), eps=1e-8, weight_decay=WD
    )
    sched = torch.optim.lr_scheduler.LambdaLR(opt, _hf_lr_lambda)
    criterion = torch.nn.BCEWithLogitsLoss()

    train_ds, eval_ds = _datasets()
    losses = []
    model.train()
    for batch in _batches(train_ds, seed=42):
        x = torch.from_numpy(np.moveaxis(batch["images"], -1, 1).copy())
        y = torch.from_numpy(np.moveaxis(batch["labels"], -1, 1).copy())
        opt.zero_grad()
        loss = criterion(model(x), y)
        loss.backward()
        opt.step()
        sched.step()
        losses.append(float(loss))

    model.eval()
    with torch.no_grad():
        logits = []
        for i in range(N_EVAL):
            s = eval_ds[i]
            x = torch.from_numpy(np.moveaxis(s["image"][None], -1, 1).copy())
            logits.append(model(x).numpy())
    eval_logits = np.moveaxis(np.concatenate(logits), 1, -1)
    eval_labels = np.stack([eval_ds[i]["mask"] for i in range(N_EVAL)])
    return init_sd, losses, eval_logits, eval_labels


@pytest.fixture(scope="module")
def tpuseg_run(torch_run, tmp_path_factory):
    """The real tpuseg Trainer from the torch init on the same batches."""
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel
    from mdeical_image_segmentation_tpu.train import Trainer, TrainingArguments
    from mdeical_image_segmentation_tpu.utils.torch_import import (
        unet_params_from_torch,
    )

    init_sd, _, _, _ = torch_run
    train_ds, eval_ds = _datasets()
    model = UNetModel(UNetConfig(in_channels=3, out_channels=1, unet_type="UNet"))
    args = TrainingArguments(
        output_dir=str(tmp_path_factory.mktemp("parity")),
        max_steps=STEPS,
        per_device_train_batch_size=BATCH // 8,  # 8-device CPU mesh → global 8
        per_device_eval_batch_size=BATCH // 8,
        learning_rate=LR,
        weight_decay=WD,
        warmup_ratio=0.0,
        eval_strategy="no",
        logging_steps=1,
        save_steps=0,
        augment=False,
        seed=42,
    )
    trainer = Trainer(model, args, train_ds, eval_ds)
    # seed the trainer with the torch init instead of the flax init
    first = train_ds[0]["image"][None]
    trainer._init_state(first, STEPS)
    trainer._compile_steps()
    variables = unet_params_from_torch(
        {k: v.numpy() for k, v in init_sd.items()}
    )
    from mdeical_image_segmentation_tpu.parallel import mesh as mesh_lib

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), variables["params"]
    )
    trainer.state = trainer.state.replace(
        params=mesh_lib.replicate(trainer.mesh, params)
    )
    result = trainer.train()

    metrics = trainer.evaluate()
    return result, metrics


def test_final_loss_matches_torch_trainer(torch_run, tpuseg_run):
    _, torch_losses, _, _ = torch_run
    result, _ = tpuseg_run
    # the logged training_loss is the mean over all steps; compare against
    # the torch loop's mean — accumulated fp32 drift stays well under 1%
    torch_mean = float(np.mean(torch_losses))
    assert result.training_loss == pytest.approx(torch_mean, rel=5e-3), (
        result.training_loss,
        torch_mean,
    )


def test_final_dice_within_half_percent_of_torch(torch_run, tpuseg_run):
    """The north-star accuracy criterion."""
    from mdeical_image_segmentation_tpu.metrics.metrics2d import compute_metrics

    _, _, eval_logits, eval_labels = torch_run
    _, metrics = tpuseg_run
    torch_metrics = compute_metrics(eval_logits, eval_labels, threshold=None)
    assert torch_metrics["dice"] > 0.1  # both actually learned something
    assert metrics["eval_dice"] == pytest.approx(
        torch_metrics["dice"], rel=5e-3
    ), (metrics["eval_dice"], torch_metrics["dice"])
    assert metrics["eval_iou"] == pytest.approx(
        torch_metrics["iou"], rel=1e-2
    ), (metrics["eval_iou"], torch_metrics["iou"])
