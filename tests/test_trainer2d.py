"""End-to-end 2D trainer on the 8-device CPU mesh: loss goes down, eval/
checkpoint/best-callback machinery works, checkpoint rotation respected.
This is the multi-device data-parallel test (SURVEY.md §4c)."""

import os

import numpy as np
import pytest

import jax

from mdeical_image_segmentation_tpu.data import SyntheticSliceDataset
from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel
from mdeical_image_segmentation_tpu.train import (
    BestIoUCallback,
    Trainer,
    TrainingArguments,
)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("train_out"))
    train_ds = SyntheticSliceDataset(n_samples=32, resolution=32)
    eval_ds = SyntheticSliceDataset(n_samples=8, resolution=32, seed=9)
    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet", base_features=4)
    )
    args = TrainingArguments(
        output_dir=out,
        max_steps=24,
        per_device_train_batch_size=1,
        per_device_eval_batch_size=1,
        eval_steps=12,
        logging_steps=6,
        save_steps=8,
        save_total_limit=2,
        learning_rate=3e-3,
        eval_threshold=0.5,
    )
    trainer = Trainer(model, args, train_ds, eval_ds, callbacks=[BestIoUCallback()])
    result = trainer.train()
    return trainer, result, out


def test_uses_all_devices(trained):
    trainer, _, _ = trained
    assert trainer.mesh.devices.size == len(jax.devices())


def test_runs_to_completion(trained):
    _, result, _ = trained
    assert result.global_step == 24
    assert np.isfinite(result.training_loss)


def test_checkpoint_rotation(trained):
    _, _, out = trained
    ckpts = sorted(d for d in os.listdir(out) if d.startswith("checkpoint-"))
    assert len(ckpts) == 2  # save_total_limit
    assert "checkpoint-24" in ckpts and "checkpoint-16" in ckpts


def test_eval_metrics_present(trained):
    trainer, _, _ = trained
    metrics = trainer.evaluate()
    assert {"eval_iou", "eval_dice", "eval_loss"} <= set(metrics)


def test_best_model_saved(trained):
    _, _, out = trained
    # BestIoUCallback triggers save_model to output_dir on improvement
    assert os.path.exists(os.path.join(out, "config.json"))
    assert os.path.exists(os.path.join(out, "params.msgpack"))


def test_metrics_logged(trained):
    _, _, out = trained
    assert os.path.exists(os.path.join(out, "logs", "metrics.jsonl"))


def test_training_reduces_loss():
    """Separate short run asserting optimization progress on an easy task."""
    train_ds = SyntheticSliceDataset(n_samples=32, resolution=32)
    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet", base_features=4)
    )
    args = TrainingArguments(
        output_dir="/tmp/tpuseg_losscheck",
        max_steps=40,
        per_device_train_batch_size=1,
        eval_strategy="no",
        logging_steps=0,
        save_steps=0,
        learning_rate=3e-3,
        augment=False,
    )
    trainer = Trainer(model, args, train_ds)
    trainer.train()

    # loss at step ~40 must beat the untrained loss on the same batch
    import jax.numpy as jnp
    from mdeical_image_segmentation_tpu.data import BatchLoader

    batch = next(iter(BatchLoader(train_ds, 8, prefetch=0)))
    out_final = model.apply(
        jax.device_get(trainer.state.variables),
        jnp.asarray(batch["images"]),
        jnp.asarray(batch["labels"]),
        train=False,
    )
    assert float(out_final.loss) < 0.55  # untrained BCE ≈ 0.69


def test_dataset_on_device_trains(tmp_path):
    """HBM-resident dataset mode: on-device batch sampling, no per-step H2D;
    must reach the same optimization behavior as the streaming path."""
    train_ds = SyntheticSliceDataset(n_samples=32, resolution=32)
    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet", base_features=4)
    )
    args = TrainingArguments(
        output_dir=str(tmp_path),
        max_steps=40,
        per_device_train_batch_size=1,
        eval_strategy="no",
        logging_steps=10,
        save_steps=0,
        learning_rate=3e-3,
        augment=False,
        dataset_on_device=True,
    )
    trainer = Trainer(model, args, train_ds)
    out = trainer.train()
    assert out.global_step == 40

    import jax.numpy as jnp

    from mdeical_image_segmentation_tpu.data import BatchLoader

    batch = next(iter(BatchLoader(train_ds, 8, prefetch=0)))
    final = model.apply(
        jax.device_get(trainer.state.variables),
        jnp.asarray(batch["images"]),
        jnp.asarray(batch["labels"]),
        train=False,
    )
    assert float(final.loss) < 0.55  # trained (untrained BCE ≈ 0.69)


def test_streaming_eval_matches_full_gather_reference():
    """The streaming (O(batch)) eval must reproduce compute_metrics exactly —
    dynamic mean threshold, wrap-padded tail excluded (eval set size 7 with
    global batch 8 forces a padded batch)."""
    from mdeical_image_segmentation_tpu.metrics.metrics2d import compute_metrics

    eval_ds = SyntheticSliceDataset(n_samples=7, resolution=32, seed=3)
    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet", base_features=4)
    )
    args = TrainingArguments(
        output_dir="/tmp/tpuseg_eval_stream",
        max_steps=1,
        per_device_eval_batch_size=1,
        eval_strategy="no",
        logging_steps=0,
        save_steps=0,
    )
    trainer = Trainer(model, args, eval_dataset=eval_ds)
    metrics = trainer.evaluate()

    # reference computation: gather every logit and use the in-memory path
    import jax as _jax
    from mdeical_image_segmentation_tpu.data.collate import BatchLoader
    from mdeical_image_segmentation_tpu.parallel import mesh as mesh_lib

    logits, labels = [], []
    n_rem = len(eval_ds)
    for batch in BatchLoader(eval_ds, trainer.eval_batch, shuffle=False):
        sharded = mesh_lib.shard_batch(trainer.mesh, batch)
        lg, _ = trainer._eval_step(trainer.state, sharded)
        take = min(n_rem, lg.shape[0])
        logits.append(np.asarray(_jax.device_get(lg))[:take])
        labels.append(batch["labels"][:take])
        n_rem -= take
    ref = compute_metrics(
        np.concatenate(logits), np.concatenate(labels), threshold=None
    )
    assert metrics["eval_iou"] == pytest.approx(ref["iou"], abs=1e-5)
    assert metrics["eval_dice"] == pytest.approx(ref["dice"], abs=1e-5)


def test_multisteps_schedule_counts_optimizer_steps():
    """With gradient_accumulation_steps=k the LR schedule must span
    ceil(total/k) optimizer steps so it actually decays to ~0."""
    import optax

    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet", base_features=4)
    )
    args = TrainingArguments(
        output_dir="/tmp/tpuseg_ms",
        max_steps=32,
        gradient_accumulation_steps=4,
        learning_rate=1e-2,
        warmup_ratio=0.0,
        weight_decay=0.0,
    )
    trainer = Trainer(model, args)
    opt = trainer._build_optimizer(32)
    params = {"w": np.zeros(1, np.float32)}
    state = opt.init(params)
    grads = {"w": np.ones(1, np.float32)}
    mags = []
    for _ in range(32):
        updates, state = opt.update(grads, state, params)
        mags.append(float(np.abs(updates["w"][0])))
    # micro-steps inside an accumulation window emit zero updates
    assert all(m == 0.0 for i, m in enumerate(mags) if (i + 1) % 4 != 0)
    per_opt_step = mags[3::4]  # 8 optimizer steps
    # warmup 0 → FULL LR at opt step 0 (HF parity), then linear decay over
    # the 8 optimizer steps — i.e. the schedule spans ceil(32/4)=8 optimizer
    # steps, not 32 (the original bug decayed only 1/4 of the way)
    assert per_opt_step[0] > 0.0
    assert per_opt_step[-1] < per_opt_step[0] * 0.3


class TestRound3ReviewRegressions:
    def _model(self):
        return UNetModel(
            UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                       base_features=4)
        )

    def test_eval_loss_excludes_wrap_padded_tail(self, tmp_path):
        """6 eval samples with eval_batch 4: the tail batch is 2 valid + 2
        wrap-padded duplicates.  eval_loss must equal the unpadded
        single-batch value — pre-fix the duplicated head rows leaked into
        the tail batch's loss mean (round-3 review finding)."""
        ds = SyntheticSliceDataset(n_samples=6, resolution=32, seed=4)
        model = self._model()

        def run(eval_bs):
            args = TrainingArguments(
                output_dir=str(tmp_path / f"eb{eval_bs}"), max_steps=1,
                per_device_train_batch_size=1,
                per_device_eval_batch_size=eval_bs,
                eval_threshold=0.5, plot_eval=False, seed=0,
            )
            t = Trainer(model, args, eval_dataset=ds)
            return t.evaluate()

        # global eval batches are 4·8=32 and 6·8=48 rows over 6 samples:
        # both wrap-pad, but 32 rows hold 5⅓ cycles of the dataset (biased
        # mean pre-fix) while 48 holds exactly 8 (unbiased) — post-fix both
        # trim to the 6 valid rows and must agree exactly
        m_tail = run(4)
        m_flat = run(6)
        for k in ("eval_loss", "eval_iou", "eval_dice"):
            np.testing.assert_allclose(m_tail[k], m_flat[k], rtol=1e-5,
                                       err_msg=k)

    def test_evaluate_without_train_dataset(self, tmp_path):
        ds = SyntheticSliceDataset(n_samples=8, resolution=32, seed=4)
        args = TrainingArguments(
            output_dir=str(tmp_path / "evalonly"), max_steps=-1,
            per_device_eval_batch_size=1, eval_threshold=0.5,
            plot_eval=False,
        )
        t = Trainer(self._model(), args, eval_dataset=ds)
        metrics = t.evaluate()
        assert {"eval_iou", "eval_dice", "eval_loss"} <= set(metrics)

    def test_zero_warmup_starts_at_full_lr(self, tmp_path):
        """HF parity: num_warmup_steps=0 means the FIRST step runs at the
        full LR — pre-fix a 1-step warmup stub made step 0 a no-op."""
        import jax.numpy as jnp
        import optax

        ds = SyntheticSliceDataset(n_samples=8, resolution=32, seed=4)
        args = TrainingArguments(
            output_dir=str(tmp_path / "warmup0"), max_steps=10,
            per_device_train_batch_size=1, learning_rate=1e-3,
            warmup_ratio=0.0,
        )
        t = Trainer(self._model(), args, train_dataset=ds)
        opt = t._build_optimizer(10)
        p = {"w": jnp.ones((4,))}
        st = opt.init(p)
        updates, _ = opt.update({"w": jnp.ones((4,))}, st, p)
        # Adam normalizes the (constant) grad to ~1, so the first update is
        # ~lr in magnitude; the pre-fix schedule made it exactly 0
        assert float(jnp.abs(updates["w"]).max()) > 1e-4
