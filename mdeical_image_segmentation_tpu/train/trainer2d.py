"""HF-Trainer-shaped 2D training runtime, pjit data-parallel.

Reference call stack being rebuilt (SURVEY.md §3.1): ``CustomTrainer``
(/root/reference/trainer/MYtrainer.py:6-11) subclasses ``transformers.Trainer``
and trains ``UNetModel`` with ``TrainingArguments`` built from the CLI flags
(/root/reference/train.py:17-137).  This module provides the same surface —
``TrainingArguments`` (same flag names/defaults as train.py), ``Trainer`` with
``train()`` / ``evaluate()`` / ``save_model()``, ``compute_metrics`` hook and
callbacks — implemented as a single jitted train step over a device mesh:

- the batch is sharded over the mesh's ``data`` axis, parameters replicated;
  XLA emits the gradient all-reduce over ICI (the DP replacement for
  DataParallel / DDP);
- train-time augmentation runs inside the step on device
  (transforms.device2d), fused with normalization and the first conv;
- the optimizer is AdamW with HF's linear warmup→linear decay schedule;
- the whole TrainState is donated — parameter updates happen in-place in HBM.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.collate import BatchLoader, SliceCollator
from ..metrics.metrics2d import (
    compute_metrics as default_compute_metrics,
    iou_dice_sums_jax,
    multiclass_iou_dice_sums_jax,
    plot_first_element,
    pred_mean_sum_jax,
    quirky_sigmoid_jax,
)
from ..parallel import mesh as mesh_lib
from ..parallel.distributed import is_primary
from ..transforms.device2d import Augment2DConfig, augment_batch
from .callbacks import TrainerCallback, TrainerControl
from .logging_utils import MetricWriter, NullMetricWriter, get_logger
from .train_state import TrainState, create_train_state

logger = get_logger(__name__)


@dataclasses.dataclass
class TrainingArguments:
    """The reference CLI surface (train.py:17-137) as a dataclass.

    Defaults mirror scripts/train.sh:4-41 where the reference pins values.
    """

    output_dir: str = "output"
    eval_strategy: str = "steps"  # "no" | "steps" | "epoch"
    eval_steps: int = 100
    logging_steps: int = 100
    num_train_epochs: float = 5000
    max_steps: int = -1  # >0 overrides epochs
    per_device_train_batch_size: int = 5
    per_device_eval_batch_size: int = 5
    gradient_accumulation_steps: int = 1
    save_steps: int = 1000
    save_total_limit: int = 5
    warmup_ratio: float = 0.001
    learning_rate: float = 0.005
    weight_decay: float = 0.001
    # HF TrainingArguments clips the global gradient norm to 1.0 by default,
    # and the reference never overrides it (train.py:114-160) — so the
    # reference's actual training runs are clipped.  0 disables.
    max_grad_norm: float = 1.0
    metric_for_best_model: str = "iou"
    greater_is_better: bool = True
    seed: int = 42
    augment: bool = True
    # Keep the whole train set in HBM (uint8) and sample minibatches on
    # device — zero per-step host→device traffic (the right mode for small
    # medical datasets like DRIVE, and for remote-attached TPUs where H2D
    # under load is expensive).  Samples i.i.d. minibatches via the device
    # PRNG instead of epoch permutations.  Must fit in ~2 GB.
    dataset_on_device: bool = False
    # Out-of-core input pipeline: decode threads per loader + ready-batch
    # queue depth.  With workers > 0 and an uncached dataset, samples are
    # stream-decoded from disk in parallel with device compute — datasets
    # larger than host RAM train at the same step rate as cached ones as
    # long as decode bandwidth × workers ≥ device consumption rate.
    dataloader_num_workers: int = 0
    dataloader_prefetch: int = 2
    eval_threshold: Optional[float] = None  # None → reference mean-threshold
    plot_eval: bool = False  # reference dumps output.png every eval
    log_dir: Optional[str] = None
    bf16: bool = False
    # Shard conv out-channels (and optimizer moments) over the mesh's
    # ``model`` axis (parallel/tensor.py).  Needs a mesh built with
    # n_model > 1; single-host only (save_model gathers params).  Use when
    # model+activations exceed one chip's HBM; throughput at reference
    # widths is better spent on the data axis.
    tensor_parallel: bool = False
    # ZeRO-1 (parallel/zero.py): partition the optimizer moments across the
    # ``data``-axis devices — params stay replicated (forward/backward
    # untouched), each device updates only its 1/N moment slice, and XLA
    # all-gathers the param updates.  ~2/3 of the Adam footprint saved per
    # device; composes with tensor_parallel (moments shard over both axes).
    # Multi-host: use the Orbax checkpoint backend, as for TP.
    zero1: bool = False
    profile_dir: Optional[str] = None  # jax.profiler trace of steps 10-13
    profile_start_step: int = 10
    profile_num_steps: int = 3

    def __post_init__(self):
        if self.eval_strategy not in ("no", "steps", "epoch"):
            # a typo ('step', 'epochs') would otherwise silently disable
            # evaluation — every consumer compares equality
            raise ValueError(
                f"eval_strategy must be 'no', 'steps' or 'epoch'; "
                f"got {self.eval_strategy!r}"
            )


@dataclasses.dataclass
class TrainOutput:
    global_step: int
    training_loss: float
    metrics: Dict[str, float]


class Trainer:
    """Data-parallel trainer for the 2D model bundles (UNetModel)."""

    def __init__(
        self,
        model,
        args: TrainingArguments,
        train_dataset=None,
        eval_dataset=None,
        data_collator: Optional[SliceCollator] = None,
        compute_metrics: Optional[Callable] = None,
        callbacks: Optional[List[TrainerCallback]] = None,
        mesh=None,
    ):
        self.model = model
        self.args = args
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.data_collator = data_collator or SliceCollator()
        self.compute_metrics = compute_metrics
        self.callbacks = callbacks or []
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.control = TrainerControl()
        # Multi-host: only process 0 writes logs/checkpoints; every process
        # loads its own disjoint slice of each global batch (process_shard).
        self.writer = (
            MetricWriter(args.log_dir or os.path.join(args.output_dir, "logs"))
            if is_primary()
            else NullMetricWriter()
        )
        self._process_shard = (
            (jax.process_index(), jax.process_count())
            if jax.process_count() > 1
            else None
        )
        self.state: Optional[TrainState] = None
        self._saved_checkpoints: List[str] = []
        self.best_metric: Optional[float] = None

        n_data = self.mesh.shape[mesh_lib.DATA_AXIS]
        self.train_batch = args.per_device_train_batch_size * n_data
        self.eval_batch = args.per_device_eval_batch_size * n_data

        self._train_step = None
        self._eval_step = None
        self._optimizer = None

    def install_preemption_handler(self, signals=None):
        """SIGTERM/SIGINT → save the model and stop at the next step."""
        import signal as _signal

        def _handler(*_):
            self.control.should_save = True
            self.control.should_stop = True

        for sig in signals or (_signal.SIGTERM, _signal.SIGINT):
            _signal.signal(sig, _handler)
        logger.info("preemption handler installed")

    # -- setup ---------------------------------------------------------------

    def _num_train_steps(self) -> int:
        if self.args.max_steps > 0:
            return self.args.max_steps
        if self.train_dataset is None:
            # eval-only Trainer (evaluate() with no train set): the count
            # only sizes the LR schedule, which such a state never steps
            return 1
        steps_per_epoch = max(len(self.train_dataset) // self.train_batch, 1)
        return int(self.args.num_train_epochs * steps_per_epoch)

    def _build_optimizer(self, total_steps: int) -> optax.GradientTransformation:
        # Under MultiSteps the inner schedule only advances every k-th call,
        # while total_steps counts micro-steps — build the schedule over
        # optimizer steps so the LR actually reaches 0 at the end of training.
        k = max(self.args.gradient_accumulation_steps, 1)
        opt_steps = -(-total_steps // k)
        warmup = int(self.args.warmup_ratio * opt_steps)
        if warmup > 0:
            schedule = optax.join_schedules(
                [
                    optax.linear_schedule(
                        0.0, self.args.learning_rate, warmup
                    ),
                    optax.linear_schedule(
                        self.args.learning_rate, 0.0,
                        max(opt_steps - warmup, 1),
                    ),
                ],
                [warmup],
            )
        else:
            # HF get_linear_schedule_with_warmup(num_warmup_steps=0) starts
            # at the FULL LR; a 1-step warmup stub would waste step 0 at LR 0
            schedule = optax.linear_schedule(
                self.args.learning_rate, 0.0, max(opt_steps, 1)
            )
        opt = optax.adamw(
            schedule, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=self.args.weight_decay,
        )
        if self.args.max_grad_norm and self.args.max_grad_norm > 0:
            # grads are clipped before the optimizer sees them, like HF's
            # accelerator.clip_grad_norm_ in Trainer.training_step
            opt = optax.chain(
                optax.clip_by_global_norm(self.args.max_grad_norm), opt
            )
        if self.args.gradient_accumulation_steps > 1:
            # micro-batch gradients averaged over k steps; the parameter
            # update (and the schedule) advance every k-th call
            opt = optax.MultiSteps(
                opt, every_k_schedule=self.args.gradient_accumulation_steps
            )
        return opt

    def _init_state(self, sample_images: np.ndarray, total_steps: int):
        self._optimizer = self._build_optimizer(total_steps)
        rng = jax.random.PRNGKey(self.args.seed)
        with self.mesh:
            state = create_train_state(
                self.model, rng, jnp.asarray(sample_images), self._optimizer
            )
        if self.args.tensor_parallel and self.mesh.shape[
            mesh_lib.MODEL_AXIS
        ] > 1:
            # every state leaf (params, adam moments, batch_stats) that has
            # a shardable trailing channel dim goes over the model axis
            from ..parallel.tensor import shard_params_tp

            self.state = shard_params_tp(state, self.mesh)
        else:
            self.state = mesh_lib.replicate(self.mesh, state)
        self._opt_specs = None
        self._param_shardings = None
        if self.args.zero1 and self.mesh.shape[mesh_lib.DATA_AXIS] > 1:
            from ..parallel.tensor import tp_param_specs
            from ..parallel.zero import shard_opt_state_zero1

            base = None
            if (
                self.args.tensor_parallel
                and self.mesh.shape[mesh_lib.MODEL_AXIS] > 1
            ):
                # compose: keep the TP out-channel partition, add the data
                # axis on the largest remaining divisible dim of each moment
                base = tp_param_specs(self.state.opt_state, self.mesh)
            new_opt, self._opt_specs = shard_opt_state_zero1(
                self.state.opt_state, self.mesh, base
            )
            self.state = self.state.replace(opt_state=new_opt)
            # params keep their own layout (replicated, or TP specs) — the
            # train step re-pins them so the data-axis moment sharding can't
            # propagate into the params on output (that would be ZeRO-3)
            self._param_shardings = jax.tree_util.tree_map(
                lambda x: x.sharding, self.state.params
            )
        self._has_bn = bool(self.state.batch_stats)

    def _compile_steps(self):
        model, optimizer = self.model, self._optimizer
        has_bn = self._has_bn
        augment = self.args.augment
        aug_cfg = Augment2DConfig()
        opt_shardings = None
        param_shardings = None
        if self._opt_specs is not None:
            from jax.sharding import NamedSharding

            opt_shardings = jax.tree_util.tree_map(
                lambda s: NamedSharding(self.mesh, s), self._opt_specs
            )
            param_shardings = self._param_shardings

        def _apply_update(state: TrainState, images, labels, drop_rng):
            """Shared grad+update body for the streaming and device-resident
            train steps (only their batch sourcing differs)."""

            def loss_fn(params):
                variables = {"params": params}
                if has_bn:
                    variables["batch_stats"] = state.batch_stats
                    (out, mutated) = model.apply(
                        variables, images, labels, train=True,
                        rngs={"dropout": drop_rng}, mutable=["batch_stats"],
                    )
                    return out.loss, mutated["batch_stats"]
                out = model.apply(
                    variables, images, labels, train=True,
                    rngs={"dropout": drop_rng},
                )
                return out.loss, state.batch_stats

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt = optimizer.update(
                grads, state.opt_state, state.params
            )
            if opt_shardings is not None:
                # ZeRO-1: pin the new moments to the input partition so the
                # donated state round-trips the layout (GSPMD would otherwise
                # be free to replicate them on output)
                new_opt = jax.lax.with_sharding_constraint(
                    new_opt, opt_shardings
                )
                # ... and the updates back to the params' layout — this IS
                # the ZeRO-1 all-gather (each device computed its moment
                # slice's updates; params stay replicated / TP-sharded)
                updates = jax.lax.with_sharding_constraint(
                    updates, param_shardings
                )
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
            )
            return new_state, loss

        def train_step(state: TrainState, batch, rng):
            step_rng = jax.random.fold_in(rng, state.step)
            aug_rng, drop_rng = jax.random.split(step_rng)
            # bf16 compute is governed by the model's compute_dtype
            # (UNetConfig.compute_dtype) — params and loss stay fp32.
            images = batch["images"]
            labels = batch["labels"]
            if augment:
                images, labels = augment_batch(aug_rng, images, labels, aug_cfg)
            return _apply_update(state, images, labels, drop_rng)

        def _eval_forward(state: TrainState, batch):
            variables = {"params": state.params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            return model.apply(
                variables, batch["images"], batch["labels"], train=False
            )

        def eval_step(state: TrainState, batch):
            out = _eval_forward(state, batch)
            return out.logits, out.loss

        # Streaming eval: O(batch) memory, outputs fully replicated so they
        # are addressable on every process under multi-host (no device_get on
        # non-addressable shards).  Two jitted passes: sufficient statistics
        # for the reference's global mean-of-sigmoided-preds threshold, then
        # thresholded per-sample IoU/Dice sums.  ``n_valid`` masks the
        # wrap-padded tail rows out on device.
        rep = mesh_lib.replicated_sharding(self.mesh)

        def eval_stats_step(state: TrainState, batch, n_valid):
            out = _eval_forward(state, batch)
            return out.loss, pred_mean_sum_jax(out.logits, n_valid)

        def eval_metric_step(state: TrainState, batch, threshold, n_valid):
            out = _eval_forward(state, batch)
            iou_sum, dice_sum = iou_dice_sums_jax(
                out.logits, batch["labels"], threshold, n_valid
            )
            preds0 = quirky_sigmoid_jax(out.logits[0].astype(jnp.float32))
            return iou_sum, dice_sum, preds0

        def eval_all_step(state: TrainState, batch, threshold, n_valid):
            # single-pass eval for a FIXED threshold: loss + metric sums in
            # one forward (the dynamic mean-threshold needs two passes)
            out = _eval_forward(state, batch)
            iou_sum, dice_sum = iou_dice_sums_jax(
                out.logits, batch["labels"], threshold, n_valid
            )
            preds0 = quirky_sigmoid_jax(out.logits[0].astype(jnp.float32))
            return out.loss, iou_sum, dice_sum, preds0

        def eval_multiclass_step(state: TrainState, batch, n_valid):
            # C>1 heads (BASELINE config #2): macro IoU/Dice over argmax
            # class maps — single pass, no threshold (the reference's
            # mean-threshold quirk is a binary-sigmoid construct).
            out = _eval_forward(state, batch)
            iou_sum, dice_sum = multiclass_iou_dice_sums_jax(
                out.logits, batch["labels"], n_valid
            )
            pred0 = jnp.argmax(out.logits[0], axis=-1).astype(jnp.float32)
            return out.loss, iou_sum, dice_sum, pred0

        # eval metric family dispatch: C>1 logits → argmax multi-class
        self._multiclass_eval = (
            getattr(getattr(model, "config", None), "out_channels", 1) > 1
        )

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)
        self._eval_stats_step = jax.jit(eval_stats_step, out_shardings=rep)
        self._eval_metric_step = jax.jit(eval_metric_step, out_shardings=rep)
        self._eval_all_step = jax.jit(eval_all_step, out_shardings=rep)
        self._eval_multiclass_step = jax.jit(
            eval_multiclass_step, out_shardings=rep
        )

        def train_step_resident(state: TrainState, images_all, labels_all, rng):
            """Device-resident data path: gather a random uint8 minibatch in
            HBM, normalize, shard over the data axis — no per-step H2D."""
            from jax.sharding import NamedSharding, PartitionSpec as P

            step_rng = jax.random.fold_in(rng, state.step)
            idx_rng, aug_rng, drop_rng = jax.random.split(step_rng, 3)
            n = images_all.shape[0]
            idx = jax.random.randint(idx_rng, (self.train_batch,), 0, n)
            images = jnp.take(images_all, idx, axis=0).astype(jnp.float32) / 255.0
            labels = jnp.take(labels_all, idx, axis=0).astype(jnp.float32)
            constraint = NamedSharding(
                self.mesh, P(mesh_lib.DATA_AXIS, None, None, None)
            )
            images = jax.lax.with_sharding_constraint(images, constraint)
            labels = jax.lax.with_sharding_constraint(labels, constraint)
            if augment:
                images, labels = augment_batch(aug_rng, images, labels, aug_cfg)
            return _apply_update(state, images, labels, drop_rng)

        self._train_step_resident = jax.jit(
            train_step_resident, donate_argnums=(0,)
        )

    # -- public API ----------------------------------------------------------

    def _maybe_residence(self):
        """Materialize the train set as device-resident uint8 arrays when
        enabled (or when it auto-fits); returns (images_all, labels_all) or
        None for the streaming path."""
        import jax.numpy as jnp

        if not self.args.dataset_on_device:
            return None
        n = len(self.train_dataset)
        sample = self.train_dataset[0]
        bytes_total = n * (sample["image"].nbytes + sample["mask"].nbytes) // 4
        if bytes_total > 2 * 1024**3:
            logger.warning(
                "dataset_on_device requested but the dataset exceeds 2 GB "
                "uint8; falling back to the streaming loader"
            )
            return None
        logger.info(
            f"dataset-on-device: {n} samples, ~{bytes_total / 1e6:.0f} MB uint8 in HBM"
        )
        images = np.stack(
            [np.clip(self.train_dataset[i]["image"] * 255, 0, 255).astype(np.uint8)
             for i in range(n)]
        )
        labels = np.stack(
            [(self.train_dataset[i]["mask"] > 0.5).astype(np.uint8)
             for i in range(n)]
        )
        sharding = mesh_lib.replicated_sharding(self.mesh)
        return (
            jax.device_put(jnp.asarray(images), sharding),
            jax.device_put(jnp.asarray(labels), sharding),
        )

    def _flush_loss_interval(self) -> Optional[float]:
        """Sync the device-side loss accumulator; returns the interval mean
        (None for an empty interval) and folds it into the run totals."""
        if self._loss_n == 0:
            return None
        interval_sum = float(jax.device_get(self._loss_acc))
        self._total_loss += interval_sum
        self._total_n += self._loss_n
        mean = interval_sum / self._loss_n
        self._loss_acc, self._loss_n = None, 0
        return mean

    def _loop_bookkeeping(self, loss, global_step, total_steps, t_start) -> bool:
        """Logging / eval / checkpoint / stop logic shared by both loops.
        Returns True when training should stop."""
        # accumulate ON DEVICE every step (a lazy scalar add — no host sync,
        # so the async dispatch pipeline stays full); the host fetch happens
        # only at logging boundaries.  training_loss therefore averages ALL
        # steps, HF-style, not every logging_steps-th one.
        self._loss_acc = loss if self._loss_acc is None else self._loss_acc + loss
        self._loss_n += 1
        if self.args.logging_steps and global_step % self.args.logging_steps == 0:
            mean = self._flush_loss_interval()
            elapsed = time.time() - t_start
            steps_run = global_step - self._start_step  # resume-aware rates
            logs = {
                "loss": mean,
                "step": global_step,
                "steps_per_sec": steps_run / elapsed,
                "samples_per_sec": steps_run * self.train_batch / elapsed,
            }
            self.writer.scalars(
                {"train/loss": logs["loss"],
                 "train/samples_per_sec": logs["samples_per_sec"]},
                global_step,
            )
            logger.info(f"step {global_step}: {logs}")
            for cb in self.callbacks:
                cb.on_log(self.args, self.state, self.control, logs)

        if (
            self.args.eval_strategy == "steps"
            and self.args.eval_steps
            and global_step % self.args.eval_steps == 0
            and self.eval_dataset is not None
        ):
            self.evaluate()

        if self.args.save_steps and global_step % self.args.save_steps == 0:
            self._save_checkpoint(global_step)

        if self.control.should_save:
            self.control.should_save = False
            self.save_model()

        return global_step >= total_steps or self.control.should_stop

    def train(self) -> TrainOutput:
        assert self.train_dataset is not None, "no train_dataset"
        total_steps = self._num_train_steps()
        loader = BatchLoader(
            self.train_dataset,
            self.train_batch,
            shuffle=True,
            seed=self.args.seed,
            collator=self.data_collator,
            process_shard=self._process_shard,
            num_workers=self.args.dataloader_num_workers,
            prefetch=self.args.dataloader_prefetch,
        )
        first = next(iter(loader))
        if self.state is None:
            self._init_state(first["images"], total_steps)
            self._compile_steps()

        rng = jax.random.PRNGKey(self.args.seed + 1)
        rng = mesh_lib.replicate(self.mesh, rng)
        self._loss_acc, self._loss_n = None, 0
        self._total_loss, self._total_n = 0.0, 0
        global_step = int(jax.device_get(self.state.step))
        self._start_step = global_step
        t_start = time.time()

        logger.info(
            f"***** training: {total_steps} steps, global batch "
            f"{self.train_batch} on {self.mesh.shape} mesh *****"
        )
        resident = self._maybe_residence()
        done = False
        profiling = False
        # resident sampling has no epochs; map eval_strategy='epoch' to an
        # epoch-equivalent step cadence so it is honored, not silently lost
        steps_per_epoch = max(1, -(-len(self.train_dataset) // self.train_batch))
        while not done:
            if resident is not None:
                images_all, labels_all = resident
                while not done:
                    self.state, loss = self._train_step_resident(
                        self.state, images_all, labels_all, rng
                    )
                    global_step += 1
                    done = self._loop_bookkeeping(
                        loss, global_step, total_steps, t_start
                    )
                    if (
                        self.args.eval_strategy == "epoch"
                        and self.eval_dataset is not None
                        and global_step % steps_per_epoch == 0
                    ):
                        self.evaluate()
                break
            # H2D transfers run two batches ahead of the compute stream
            for sharded in mesh_lib.device_prefetch(loader, self.mesh):
                if (
                    self.args.profile_dir
                    and global_step == self.args.profile_start_step
                    and not profiling
                ):
                    jax.profiler.start_trace(self.args.profile_dir)
                    profiling = True
                self.state, loss = self._train_step(self.state, sharded, rng)
                global_step += 1
                if (
                    profiling
                    and global_step
                    >= self.args.profile_start_step + self.args.profile_num_steps
                ):
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info(f"profiler trace written to {self.args.profile_dir}")

                if self._loop_bookkeeping(loss, global_step, total_steps, t_start):
                    done = True
                    break
            if self.args.eval_strategy == "epoch" and self.eval_dataset is not None:
                self.evaluate()

        if profiling:
            jax.profiler.stop_trace()
        self._flush_loss_interval()  # fold the partial tail interval in
        train_loss = self._total_loss / max(self._total_n, 1)
        return TrainOutput(global_step, train_loss, {"train_loss": train_loss})

    def evaluate(self, eval_dataset=None) -> Dict[str, float]:
        dataset = eval_dataset or self.eval_dataset
        assert dataset is not None, "no eval_dataset"
        if self.state is None:
            loader0 = BatchLoader(dataset, self.eval_batch, collator=self.data_collator)
            first = next(iter(loader0))
            self._init_state(first["images"], max(self._num_train_steps(), 1))
            self._compile_steps()

        if self.compute_metrics is not None:
            metrics = self._evaluate_full_gather(dataset)
        else:
            metrics = self._evaluate_streaming(dataset)

        step = int(jax.device_get(self.state.step))
        self.writer.scalars(metrics, step)
        logger.info(f"eval @ {step}: {metrics}")

        key = f"eval_{self.args.metric_for_best_model}"
        if key in metrics:
            value = metrics[key]
            better = (
                self.best_metric is None
                or (value > self.best_metric) == self.args.greater_is_better
            )
            if better:
                self.best_metric = value
        for cb in self.callbacks:
            cb.on_evaluate(self.args, self.state, self.control, metrics)
        return metrics

    _EVAL_LOADER_CACHE_MAX = 4

    def _eval_loader(self, dataset) -> BatchLoader:
        # cached per dataset: each BatchLoader owns a worker pool, and eval
        # runs twice per evaluate() — fresh loaders would leak num_workers
        # threads per call over a long run.  A small LRU (dict insertion
        # order) bounds the cache so ad-hoc evaluate(eval_dataset=...) calls
        # with fresh dataset objects can't grow worker pools / pin datasets
        # unboundedly; evicted loaders are closed.  close_loaders() is the
        # explicit teardown.
        cache = getattr(self, "_eval_loader_cache", None)
        if cache is None:
            cache = self._eval_loader_cache = {}
        key = id(dataset)
        if key in cache:
            cache[key] = cache.pop(key)  # refresh LRU position
        else:
            while len(cache) >= self._EVAL_LOADER_CACHE_MAX:
                _, old = cache.pop(next(iter(cache)))
                old.close()
            cache[key] = (
                dataset,  # strong ref keeps id(dataset) valid while cached
                BatchLoader(
                    dataset,
                    self.eval_batch,
                    shuffle=False,
                    collator=self.data_collator,
                    process_shard=self._process_shard,
                    num_workers=self.args.dataloader_num_workers,
                    prefetch=self.args.dataloader_prefetch,
                ),
            )
        return cache[key][1]

    def close_loaders(self) -> None:
        """Close all cached eval loaders (worker threads + pinned datasets)."""
        cache = getattr(self, "_eval_loader_cache", None) or {}
        for _, loader in cache.values():
            loader.close()
        cache.clear()

    def _evaluate_streaming(self, dataset) -> Dict[str, float]:
        """O(batch)-memory eval: per-batch sufficient statistics accumulated
        on device, fully-replicated scalar outputs (multi-host safe).

        Pass 1 accumulates the weighted loss and the global mean of sigmoided
        predictions (the reference's dynamic threshold, metrcis.py:163); pass
        2 re-runs the forward and accumulates thresholded per-sample IoU/Dice
        sums.  Eval cost is 2 forwards when the dynamic threshold is used —
        the price of exact mean-threshold parity without materializing the
        whole eval set's logits anywhere.
        """
        n_total = len(dataset)

        def _trim(batch, n_valid):
            """Drop the wrap-padded tail rows before device_put so the loss
            (a plain batch mean inside the model) never sees duplicate rows
            — shard_batch falls back to replicated sharding for the odd
            size (one extra compile, tail batch only).  Multi-host keeps
            the padded rows: each process holds a local slice of the
            global batch, so row-trimming isn't well-defined there (the
            n_valid device masks keep iou/dice exact; eval_loss carries
            the padded tail rows weighted by n_valid)."""
            if n_valid == self.eval_batch or jax.process_count() > 1:
                return batch
            return {k: v[:n_valid] for k, v in batch.items()}

        fixed_thr = self.args.eval_threshold
        loss_sum, pred_sum, n_seen = 0.0, 0.0, 0

        if getattr(self, "_multiclass_eval", False):
            # C>1 heads: single-pass argmax macro-IoU/Dice (no threshold)
            iou_sum, dice_sum = 0.0, 0.0
            n_remaining, first = n_total, True
            for batch in self._eval_loader(dataset):
                n_valid = min(n_remaining, self.eval_batch)
                sharded = mesh_lib.shard_batch(
                    self.mesh, _trim(batch, n_valid)
                )
                loss, isum, dsum, pred0 = self._eval_multiclass_step(
                    self.state, sharded, jnp.int32(n_valid)
                )
                loss_sum += float(jax.device_get(loss)) * n_valid
                iou_sum += float(jax.device_get(isum))
                dice_sum += float(jax.device_get(dsum))
                n_seen += n_valid
                if first and self.args.plot_eval and is_primary():
                    labs0 = np.asarray(batch["labels"][:1], np.float32)
                    if labs0.ndim == 4 and labs0.shape[-1] == 1:
                        labs0 = labs0[..., 0]
                    # binarize the class maps at foreground-vs-background
                    # for the reference-style pred/label PNG panel
                    p0 = np.asarray(jax.device_get(pred0), np.float32)
                    plot_first_element(
                        (p0[None] > 0).astype(np.float32),
                        (labs0 > 0).astype(np.float32), threshold=0.5,
                        save_path=os.path.join(
                            self.args.output_dir, "output.png"
                        ),
                    )
                first = False
                n_remaining -= n_valid
            return {
                "eval_iou": iou_sum / max(n_total, 1),
                "eval_dice": dice_sum / max(n_total, 1),
                "eval_loss": loss_sum / n_seen if n_seen else float("nan"),
            }

        if fixed_thr is None:
            # pass 1: loss + the global mean-of-sigmoided-preds statistic
            n_remaining = n_total
            for batch in self._eval_loader(dataset):
                n_valid = min(n_remaining, self.eval_batch)
                sharded = mesh_lib.shard_batch(
                    self.mesh, _trim(batch, n_valid)
                )
                loss, psum = self._eval_stats_step(
                    self.state, sharded, jnp.int32(n_valid)
                )
                loss_sum += float(jax.device_get(loss)) * n_valid
                pred_sum += float(jax.device_get(psum))
                n_seen += n_valid
                n_remaining -= n_valid
            thr = pred_sum / max(n_seen, 1)
        else:
            thr = fixed_thr

        iou_sum, dice_sum = 0.0, 0.0
        n_remaining = n_total
        first = True
        for batch in self._eval_loader(dataset):
            n_valid = min(n_remaining, self.eval_batch)
            sharded = mesh_lib.shard_batch(self.mesh, _trim(batch, n_valid))
            if fixed_thr is None:
                isum, dsum, preds0 = self._eval_metric_step(
                    self.state, sharded, jnp.float32(thr), jnp.int32(n_valid)
                )
            else:
                # fixed threshold: single-pass eval (loss rides along)
                loss, isum, dsum, preds0 = self._eval_all_step(
                    self.state, sharded, jnp.float32(thr), jnp.int32(n_valid)
                )
                loss_sum += float(jax.device_get(loss)) * n_valid
                n_seen += n_valid
            iou_sum += float(jax.device_get(isum))
            dice_sum += float(jax.device_get(dsum))
            if first and self.args.plot_eval and is_primary():
                labs0 = np.asarray(batch["labels"][:1], np.float32)
                if labs0.ndim == 4 and labs0.shape[-1] == 1:
                    labs0 = labs0[..., 0]
                p0 = np.asarray(jax.device_get(preds0))
                if p0.ndim == 3 and p0.shape[-1] == 1:
                    p0 = p0[..., 0]
                plot_first_element(
                    p0[None], labs0, threshold=thr,
                    save_path=os.path.join(self.args.output_dir, "output.png"),
                )
            first = False
            n_remaining -= n_valid

        return {
            "eval_iou": iou_sum / max(n_total, 1),
            "eval_dice": dice_sum / max(n_total, 1),
            "eval_loss": loss_sum / n_seen if n_seen else float("nan"),
        }

    def _evaluate_full_gather(self, dataset) -> Dict[str, float]:
        """Legacy path for user ``compute_metrics`` hooks that need the full
        (logits, labels) arrays on host.  Single-process only — the hook
        contract cannot stream."""
        assert jax.process_count() == 1, (
            "a custom compute_metrics hook requires gathering all logits on "
            "one host; use the default streaming metrics under multi-host"
        )
        all_logits, all_labels, losses = [], [], []
        n_remaining = len(dataset)
        for batch in self._eval_loader(dataset):
            take = min(n_remaining, self.eval_batch)  # unpad wrapped tail
            if take < self.eval_batch:
                # trim BEFORE the forward so the batch-mean loss carries no
                # wrap-padded duplicate rows (shard_batch replicates the
                # odd-sized tail batch)
                batch = {k: v[:take] for k, v in batch.items()}
            sharded = mesh_lib.shard_batch(self.mesh, batch)
            logits, loss = self._eval_step(self.state, sharded)
            all_logits.append(np.asarray(jax.device_get(logits)))
            all_labels.append(batch["labels"])
            losses.append((float(jax.device_get(loss)), take))
            n_remaining -= take

        logits = np.concatenate(all_logits, axis=0)
        labels = np.concatenate(all_labels, axis=0)
        metrics = self.compute_metrics(logits, labels)
        metrics = {f"eval_{k}": v for k, v in metrics.items()}
        n_seen = sum(t for _, t in losses)
        metrics["eval_loss"] = (
            sum(l * t for l, t in losses) / n_seen if n_seen else float("nan")
        )
        return metrics

    # -- persistence ---------------------------------------------------------

    def save_model(self, path: Optional[str] = None):
        if not is_primary():
            return  # multi-host: params are replicated; only process 0 writes
        path = path or self.args.output_dir
        variables = jax.device_get(self.state.variables)
        self.model.save_pretrained(path, variables)
        logger.info(f"model saved to {path}")

    def _save_checkpoint(self, step: int):
        if not is_primary():
            return
        path = os.path.join(self.args.output_dir, f"checkpoint-{step}")
        self.save_model(path)
        self._saved_checkpoints.append(path)
        limit = self.args.save_total_limit
        while limit and len(self._saved_checkpoints) > limit:
            victim = self._saved_checkpoints.pop(0)
            shutil.rmtree(victim, ignore_errors=True)


class CustomTrainer(Trainer):
    """Name-parity alias for the reference's trainer subclass
    (trainer/MYtrainer.py:6-11) — the loss-from-outputs behavior is already
    the default here."""
