"""Config-driven 3D training runtime (UNetTrainer semantics), pjit data-parallel.

Reference: create_trainer / UNetTrainer (/root/reference/model/unet3d/trainer.py).
The epoch/iteration loop semantics are preserved exactly:

- ``fit()`` runs epochs up to ``max_num_epochs``; ``train()`` iterates the
  train loader;
- every ``validate_after_iters``: full validation, scheduler step
  (ReduceLROnPlateau gets the eval score, others step blindly — the
  reference's WARN about per-validation stepping applies), best-score
  tracking, last/best checkpoint;
- every ``log_after_iters``: train eval score with the final activation
  applied (trainer.py:209-221), scalar + image logging;
- stop when ``max_num_iterations`` is exceeded or lr < 1e-6 (trainer.py:239-254);
- parity quirk preserved: validation scores the *raw logits* against the
  target (trainer.py:272) while the train-metric path activates first.

TPU-native execution: one jitted train step (fwd+bwd+optimizer, donated
state) over a device mesh with the batch sharded on the data axis — XLA's
all-reduce over ICI replaces nn.DataParallel (trainer.py:23-25).  The LR is
injected into the optimizer state each step so host-side torch-style
schedulers (optimizers.py) drive it without recompilation.
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loaders import get_train_loaders
from ..losses.losses3d import get_loss_criterion
from ..metrics.metrics3d import get_evaluation_metric
from ..models.unet3d import get_model
from ..parallel import mesh as mesh_lib
from . import checkpoint as ckpt
from .logging_utils import (
    MetricWriter,
    RunningAverage,
    get_logger,
    get_tensorboard_formatter,
)
from .optimizers import (
    ReduceLROnPlateau,
    create_lr_scheduler,
    create_optimizer,
    set_learning_rate,
)

logger = get_logger("UNetTrainer")


def get_number_of_learnable_parameters(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def create_trainer(config: Dict[str, Any]) -> "UNetTrainer":
    """Assemble model/loss/metric/loaders/optimizer/scheduler/trainer from a
    reference-shaped config (reference trainer.py:19-55)."""
    model = get_model(config["model"])
    # optional `parallel:` config section: model_axis (mesh width for
    # tensor parallelism), tensor_parallel (shard the state over it), and
    # spatial_halo/spatial_shard_axis (train each batch as ONE spatially-
    # sharded volume with ppermute halo exchange — parallel/spatial.py)
    par_cfg = config.get("parallel", {}) or {}
    mesh = mesh_lib.make_mesh(n_model=int(par_cfg.get("model_axis", 1)))
    n_data = mesh.shape[mesh_lib.DATA_AXIS]
    if n_data > 1:
        logger.info(f"Using {n_data} devices for training (data-parallel mesh)")

    loss_criterion = get_loss_criterion(config)
    eval_criterion = get_evaluation_metric(config)
    # spatial mode: devices split each volume, not the batch — don't scale
    # the loader batch by the mesh width
    spatial = bool(par_cfg.get("spatial_halo"))
    # device_cache (loaders config) composes with DP/TP/ZeRO-1 but not with
    # spatial mode (there the loader batch is one whole spatially-sharded
    # volume, not a coordinate-sampled patch batch)
    loaders = get_train_loaders(
        config,
        n_devices=1 if spatial else n_data,
        mesh=None if spatial else mesh,
    )

    optimizer_config = config["optimizer"]
    optimizer = create_optimizer(optimizer_config)
    base_lr = optimizer_config.get("learning_rate", 1e-3)
    lr_scheduler = create_lr_scheduler(config.get("lr_scheduler", None), base_lr)

    trainer_config = dict(config["trainer"])
    tensorboard_formatter = get_tensorboard_formatter(
        trainer_config.pop("tensorboard_formatter", None)
    )
    resume = trainer_config.pop("resume", None)
    pre_trained = trainer_config.pop("pre_trained", None)

    return UNetTrainer(
        model=model,
        optimizer=optimizer,
        base_lr=base_lr,
        lr_scheduler=lr_scheduler,
        loss_criterion=loss_criterion,
        eval_criterion=eval_criterion,
        loaders=loaders,
        tensorboard_formatter=tensorboard_formatter,
        resume=resume,
        pre_trained=pre_trained,
        mesh=mesh,
        seed=config.get("seed", 0),
        tensor_parallel=bool(par_cfg.get("tensor_parallel", False)),
        zero1=bool(par_cfg.get("zero1", False)),
        spatial_halo=par_cfg.get("spatial_halo"),
        spatial_shard_axis=int(par_cfg.get("spatial_shard_axis", 2)),
        spatial_cross_shard_norm=bool(
            par_cfg.get("spatial_cross_shard_norm", False)
        ),
        **trainer_config,
    )


class UNetTrainer:
    def __init__(
        self,
        model,
        optimizer,
        lr_scheduler,
        loss_criterion,
        eval_criterion,
        loaders,
        checkpoint_dir: str,
        max_num_epochs: int,
        max_num_iterations: int,
        validate_after_iters: int = 200,
        log_after_iters: int = 100,
        validate_iters: Optional[int] = None,
        num_iterations: int = 1,
        num_epoch: int = 0,
        eval_score_higher_is_better: bool = True,
        tensorboard_formatter=None,
        skip_train_validation: bool = False,
        resume: Optional[str] = None,
        pre_trained: Optional[str] = None,
        mesh=None,
        base_lr: float = 1e-3,
        seed: int = 0,
        tensor_parallel: bool = False,
        zero1: bool = False,
        spatial_halo: Optional[int] = None,
        spatial_shard_axis: int = 2,
        spatial_cross_shard_norm: bool = False,
        **kwargs,
    ):
        self.model = model
        self.optimizer = optimizer
        self.scheduler = lr_scheduler
        self.loss_criterion = loss_criterion
        self.eval_criterion = eval_criterion
        self.loaders = loaders
        if resume:
            # re-target the run dir NOW, before the MetricWriter/log dirs
            # are created, so the config snapshot and JSONL/TB events land
            # next to the checkpoints of the run being resumed instead of
            # splitting artifacts across two directories (_init_state keeps
            # applying the same rule when it loads the state)
            resumed_dir = os.path.dirname(os.path.normpath(resume))
            checkpoint_dir = resumed_dir or checkpoint_dir
        self.checkpoint_dir = checkpoint_dir
        self.max_num_epochs = max_num_epochs
        self.max_num_iterations = max_num_iterations
        self.validate_after_iters = validate_after_iters
        self.log_after_iters = log_after_iters
        self.validate_iters = validate_iters
        self.eval_score_higher_is_better = eval_score_higher_is_better
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.tensor_parallel = bool(
            tensor_parallel and self.mesh.shape[mesh_lib.MODEL_AXIS] > 1
        )
        # spatial training (``parallel.spatial_halo``): each batch is ONE
        # spatially-sharded volume over the data axis, conv halos exchanged
        # via ppermute (parallel/spatial.py) — for volumes too large per
        # device.  GroupNorm statistics are per-shard by default (the same
        # per-patch semantics the reference's SliceBuilder training already
        # has); ``parallel.spatial_cross_shard_norm: true`` psums them
        # across the mesh axis for mesh-width-exact 'gcr' training.
        self.spatial_halo = int(spatial_halo) if spatial_halo else None
        self.spatial_shard_axis = int(spatial_shard_axis)
        self.spatial_cross_shard_norm = bool(spatial_cross_shard_norm)
        assert not (self.spatial_halo and self.tensor_parallel), (
            "spatial_halo and tensor_parallel are mutually exclusive"
        )
        # ZeRO-1 (``parallel.zero1: true``): Adam moments partitioned over
        # the data axis — parallel/zero.py.  The spatial step manages its
        # own (replicated) optimizer state, so the two don't compose.
        self.zero1 = bool(
            zero1 and self.mesh.shape[mesh_lib.DATA_AXIS] > 1
        )
        assert not (self.spatial_halo and self.zero1), (
            "spatial_halo and zero1 are mutually exclusive"
        )
        self._opt_specs = None
        self._param_shardings = None
        self.current_lr = base_lr
        self.seed = seed

        logger.info(f"eval_score_higher_is_better: {eval_score_higher_is_better}")
        self.best_eval_score = (
            float("-inf") if eval_score_higher_is_better else float("+inf")
        )

        # multi-host: only process 0 writes logs/checkpoints
        from ..parallel.distributed import is_primary
        from .logging_utils import NullMetricWriter

        self.writer = (
            MetricWriter(
                os.path.join(
                    checkpoint_dir, "logs",
                    datetime.now().strftime("%Y-%m-%d_%H-%M-%S"),
                )
            )
            if is_primary()
            else NullMetricWriter()
        )
        assert tensorboard_formatter is not None, "TensorboardFormatter must be provided"
        self.tensorboard_formatter = tensorboard_formatter

        self.num_iterations = num_iterations
        self.num_epochs = num_epoch
        self.skip_train_validation = skip_train_validation

        # Lazily-initialized jitted state (needs a sample batch for shapes).
        self._state = None  # dict: params, batch_stats, opt_state
        self._train_step = None
        self._eval_step = None
        self._has_bn = False

        self._resume_path = resume
        self._pre_trained_path = pre_trained
        # preemption handling (absent in the reference, SURVEY.md §5): when
        # install_preemption_handler() is active, SIGTERM/SIGINT request a
        # graceful stop — the loop checkpoints and exits instead of dying
        # mid-step, and `resume` picks up where it left off.
        self._preempted = False

    def request_stop(self):
        """Ask the training loop to checkpoint and stop at the next step."""
        self._preempted = True

    def install_preemption_handler(self, signals=None):
        """Route SIGTERM/SIGINT to a graceful checkpoint-and-stop."""
        import signal as _signal

        if signals is None:
            signals = (_signal.SIGTERM, _signal.SIGINT)
        for sig in signals:
            _signal.signal(sig, lambda *_: self.request_stop())
        logger.info(f"preemption handler installed for {signals}")

    # -- state management ----------------------------------------------------

    def _place_state(self, state):
        """Lay out the train state on the mesh: replicated (default) or with
        conv out-channels + optimizer moments sharded over the model axis
        (``parallel.tensor_parallel: true`` in the YAML config)."""
        if self.tensor_parallel:
            from ..parallel.tensor import shard_params_tp

            state = shard_params_tp(state, self.mesh)
        else:
            state = mesh_lib.replicate(self.mesh, state)
        if self.zero1:
            from ..parallel.tensor import tp_param_specs
            from ..parallel.zero import shard_opt_state_zero1

            base = (
                tp_param_specs(state["opt_state"], self.mesh)
                if self.tensor_parallel
                else None
            )
            new_opt, self._opt_specs = shard_opt_state_zero1(
                state["opt_state"], self.mesh, base
            )
            state = dict(state, opt_state=new_opt)
            # params keep their own layout — the step re-pins them so the
            # moments' data-axis sharding can't leak into params on output
            self._param_shardings = jax.tree_util.tree_map(
                lambda x: x.sharding, state["params"]
            )
        return state

    def _init_state(self, sample_input: np.ndarray):
        rng = jax.random.PRNGKey(self.seed)
        x = jnp.asarray(sample_input[:1])
        if not self.model.is3d:
            x = jnp.squeeze(x, axis=1)
        # jitted init: eager init dispatches per-op through the device
        # tunnel (~150 s measured for UNet3D f_maps=32 on the remote chip,
        # r5); one jitted (cacheable) program brings it to seconds
        variables = jax.jit(self.model.init, static_argnums=2)(rng, x, True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self._has_bn = bool(batch_stats)
        logger.info(
            f"Number of learnable params {get_number_of_learnable_parameters(params)}"
        )
        opt_state = jax.jit(self.optimizer.init)(params)
        state = {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": opt_state,
        }
        self._state = self._place_state(state)

        if self._resume_path is not None and os.path.isdir(self._resume_path):
            # orbax layout (the TP-sharded save): restore against a template
            # already placed on the mesh — leaves come back with the same
            # shardings, no host gather
            from .orbax_ckpt import OrbaxCheckpointer

            logger.info(f"Loading orbax checkpoint '{self._resume_path}'...")
            # self._state (placed above) doubles as the restore template —
            # leaves come back with its shardings, no second placement pass
            self._orbax = OrbaxCheckpointer(self._resume_path)
            saved = self._orbax.restore(
                template={
                    "num_epochs": 0,
                    "num_iterations": 0,
                    "model_state_dict": {
                        "params": self._state["params"],
                        "batch_stats": self._state["batch_stats"],
                    },
                    "best_eval_score": 0.0,
                    "optimizer_state_dict": self._state["opt_state"],
                }
            )
            self._state = {
                "params": saved["model_state_dict"]["params"],
                "batch_stats": saved["model_state_dict"]["batch_stats"],
                "opt_state": saved["optimizer_state_dict"],
            }
            self.best_eval_score = float(saved["best_eval_score"])
            self.num_iterations = int(saved["num_iterations"])
            self.num_epochs = int(saved["num_epochs"])
            # keep writing into the run being resumed (msgpack-branch
            # parity; __init__ already re-targeted the log dirs the same way)
            self.checkpoint_dir = os.path.dirname(
                os.path.normpath(self._resume_path)
            )
            logger.info(
                f"Checkpoint loaded. Epoch: {self.num_epochs}. "
                f"Iteration: {self.num_iterations}. "
                f"Best val score: {self.best_eval_score}."
            )
        elif self._resume_path is not None:
            logger.info(f"Loading checkpoint '{self._resume_path}'...")
            saved = ckpt.load_checkpoint(
                self._resume_path,
                template={
                    "num_epochs": 0,
                    "num_iterations": 0,
                    "model_state_dict": {"params": params, "batch_stats": batch_stats},
                    "best_eval_score": 0.0,
                    "optimizer_state_dict": opt_state,
                },
            )
            self._state = self._place_state(
                {
                    "params": saved["model_state_dict"]["params"],
                    "batch_stats": saved["model_state_dict"]["batch_stats"],
                    "opt_state": saved["optimizer_state_dict"],
                }
            )
            self.best_eval_score = float(saved["best_eval_score"])
            self.num_iterations = int(saved["num_iterations"])
            self.num_epochs = int(saved["num_epochs"])
            self.checkpoint_dir = os.path.dirname(
                os.path.normpath(self._resume_path)
            )
            logger.info(
                f"Checkpoint loaded. Epoch: {self.num_epochs}. "
                f"Iteration: {self.num_iterations}. "
                f"Best val score: {self.best_eval_score}."
            )
        elif self._pre_trained_path is not None:
            logger.info(f"Loading pre-trained model from '{self._pre_trained_path}'...")
            saved = ckpt.load_checkpoint(
                self._pre_trained_path,
                template={
                    "num_epochs": 0,
                    "num_iterations": 0,
                    "model_state_dict": {"params": params, "batch_stats": batch_stats},
                    "best_eval_score": 0.0,
                    "optimizer_state_dict": opt_state,
                },
            )
            self._state = self._place_state(
                {
                    "params": saved["model_state_dict"]["params"],
                    "batch_stats": saved["model_state_dict"]["batch_stats"],
                    "opt_state": opt_state,
                },
            )

        self._compile_steps()

    def _apply_model(self, variables, x, train, rngs=None, mutable=False):
        """Forward with the UNet2D z-squeeze special case
        (reference trainer.py:302-320)."""
        if not self.model.is3d:
            x = jnp.squeeze(x, axis=1)
        result = self.model.apply(variables, x, train, rngs=rngs, mutable=mutable)
        if mutable:
            out, mut = result
        else:
            out, mut = result, None
        if not self.model.is3d:
            out = jnp.expand_dims(out, axis=1)
        return (out, mut) if mutable else out

    def _compile_steps(self):
        optimizer = self.optimizer
        loss_criterion = self.loss_criterion
        has_bn = self._has_bn
        opt_shardings = None
        param_shardings = None
        if self._opt_specs is not None:
            from jax.sharding import NamedSharding

            opt_shardings = jax.tree_util.tree_map(
                lambda s: NamedSharding(self.mesh, s), self._opt_specs
            )
            param_shardings = self._param_shardings

        def train_step(state, input, target, weight, rng, lr):
            import optax

            def loss_fn(params):
                variables = {"params": params}
                if has_bn:
                    variables["batch_stats"] = state["batch_stats"]
                    (output, mut) = self._apply_model(
                        variables, input, True, rngs={"dropout": rng},
                        mutable=["batch_stats"],
                    )
                    new_bs = mut["batch_stats"]
                else:
                    output = self._apply_model(
                        variables, input, True, rngs={"dropout": rng}
                    )
                    new_bs = state["batch_stats"]
                if weight is None:
                    loss = loss_criterion(output, target)
                else:
                    loss = loss_criterion(output, target, weight)
                return loss, (output, new_bs)

            (loss, (output, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state["params"])
            opt_state = set_learning_rate(state["opt_state"], lr)
            updates, new_opt = optimizer.update(
                grads, opt_state, state["params"]
            )
            if opt_shardings is not None:
                # ZeRO-1: pin the new moments to the input partition so the
                # donated state round-trips the layout
                new_opt = jax.lax.with_sharding_constraint(
                    new_opt, opt_shardings
                )
                # ... and the updates back to the params' layout — this IS
                # the ZeRO-1 all-gather; without it GSPMD leaves the params
                # data-sharded on output (ZeRO-3 semantics, unwanted)
                updates = jax.lax.with_sharding_constraint(
                    updates, param_shardings
                )
            new_params = optax.apply_updates(state["params"], updates)
            return (
                {"params": new_params, "batch_stats": new_bs, "opt_state": new_opt},
                loss,
                output,
            )

        def eval_step(state, input, target, weight):
            variables = {"params": state["params"]}
            if has_bn:
                variables["batch_stats"] = state["batch_stats"]
            output = self._apply_model(variables, input, False)
            if weight is None:
                loss = loss_criterion(output, target)
            else:
                loss = loss_criterion(output, target, weight)
            return output, loss

        self._train_step = jax.jit(train_step, donate_argnums=(0,),
                                   static_argnames=())
        self._eval_step = jax.jit(eval_step)

        self._spatial_step = None
        if self.spatial_halo:
            from ..parallel.spatial import make_spatial_train_step

            assert self.model.is3d, "spatial training is 3D-only"
            assert not has_bn, (
                "spatial training does not support BatchNorm orders "
                "(global batch statistics across shards); use 'gcr'/'cr'"
            )
            self._spatial_step = make_spatial_train_step(
                self.model, loss_criterion, optimizer, self.mesh,
                halo=self.spatial_halo, shard_axis=self.spatial_shard_axis,
                cross_shard_norm=self.spatial_cross_shard_norm,
            )

    # -- loop ---------------------------------------------------------------

    def fit(self):
        # while-loop (not a frozen range): state restore happens lazily in
        # the first train() iteration, so num_epochs may jump mid-loop — a
        # pre-captured range would run max_num_epochs EXTRA epochs on resume
        while self.num_epochs < self.max_num_epochs:
            should_terminate = self.train()
            if should_terminate:
                logger.info("Stopping criterion is satisfied. Finishing training")
                return
            self.num_epochs += 1
        logger.info(
            f"Reached maximum number of epochs: {self.max_num_epochs}. "
            f"Finishing training..."
        )

    def _prefetched_batches(self, loader, size: int = 2):
        """Device-put ``size`` batches ahead so H2D transfers overlap the
        preceding train steps (parallel/mesh.py::device_prefetch with the
        weight/spatial-aware ``_split_training_batch`` as the placement)."""
        return mesh_lib.device_prefetch(
            loader, self.mesh, size=size, put=self._split_training_batch
        )

    def train(self) -> bool:
        train_losses = RunningAverage()
        train_eval_scores = RunningAverage()
        rng = jax.random.PRNGKey(self.seed + 1)

        # Device-side loss accumulation (same pattern as trainer2d's
        # _loop_bookkeeping): a lazy scalar add per step, host-synced only
        # at log/validate boundaries and at epoch end, so JAX's async
        # dispatch pipeline stays full — a per-step float(loss) fetch
        # serializes every step through the tunnel (measured: it was most
        # of the 179 vs ~95 ms/step gap on the device_cache path, PERF.md).
        # Identical averages: the batch size is static, so flushing
        # interval_sum/steps with weight n*steps equals per-step updates.
        loss_acc, loss_acc_n, loss_acc_steps = None, 0, 0

        def flush_losses():
            nonlocal loss_acc, loss_acc_n, loss_acc_steps
            if loss_acc_steps:
                train_losses.update(
                    float(jax.device_get(loss_acc)) / loss_acc_steps,
                    loss_acc_n,
                )
                loss_acc, loss_acc_n, loss_acc_steps = None, 0, 0

        train_loader = self.loaders["train"]
        if getattr(train_loader, "is_device_cached", False):
            # HBM-resident volumes (data/device_cache.py): batches come out
            # of a jitted sampler already device-placed and batch-sharded —
            # no host assembly, no H2D, nothing to prefetch
            batches = iter(train_loader)
        else:
            batches = self._prefetched_batches(train_loader)
        for input, target, weight in batches:
            logger.info(
                f"Training iteration [{self.num_iterations}/"
                f"{self.max_num_iterations}]. Epoch [{self.num_epochs}/"
                f"{self.max_num_epochs - 1}]"
            )
            if self._state is None:
                self._init_state(input)

            step_rng = jax.random.fold_in(rng, self.num_iterations)
            if self._spatial_step is not None:
                assert weight is None, (
                    "per-voxel weights are unsupported in spatial mode"
                )
                opt_state = self._state["opt_state"]
                # host-side LR injection: hyperparams ride inside opt_state
                # through the shard_map step (same plateau-on-eval semantics)
                if hasattr(opt_state, "hyperparams"):
                    opt_state = set_learning_rate(
                        opt_state, jnp.asarray(self.current_lr, jnp.float32)
                    )
                params, opt_state, loss = self._spatial_step(
                    self._state["params"], opt_state, input, target, step_rng
                )
                self._state = {
                    "params": params,
                    "batch_stats": self._state["batch_stats"],
                    "opt_state": opt_state,
                }
                output = None  # spatial step returns loss only
            else:
                self._state, loss, output = self._train_step(
                    self._state, input, target, weight, step_rng,
                    jnp.asarray(self.current_lr, jnp.float32),
                )
            loss_acc = loss if loss_acc is None else loss_acc + loss
            loss_acc_n += self._batch_size(input)
            loss_acc_steps += 1

            if self.num_iterations % self.validate_after_iters == 0:
                flush_losses()
                eval_score = self.validate()
                if isinstance(self.scheduler, ReduceLROnPlateau):
                    self.current_lr = self.scheduler.step(eval_score)
                elif self.scheduler is not None:
                    self.current_lr = self.scheduler.step()
                self._log_lr()
                is_best = self._is_best_eval_score(eval_score)
                self._save_checkpoint(is_best)

            if self.num_iterations % self.log_after_iters == 0:
                flush_losses()
                if not self.skip_train_validation and output is not None:
                    final_activation = self.model.final_activation()
                    act_output = (
                        final_activation(output)
                        if final_activation is not None
                        else output
                    )
                    eval_score = float(
                        np.asarray(self.eval_criterion(act_output, target))
                    )
                    train_eval_scores.update(eval_score, self._batch_size(input))
                if output is None:  # spatial mode: no per-step output/score
                    logger.info(f"Training stats. Loss: {train_losses.avg}.")
                    self._log_stats("train", train_losses.avg, None)
                else:
                    logger.info(
                        f"Training stats. Loss: {train_losses.avg}. "
                        f"Evaluation score: {train_eval_scores.avg}"
                    )
                    self._log_stats(
                        "train", train_losses.avg, train_eval_scores.avg
                    )
                    self._log_images(input, target, output, "train_")

            if self._preempted:
                logger.info("Preemption requested: checkpointing and stopping")
                self._save_checkpoint(is_best=False)
                return True

            if self.should_stop():
                return True
            self.num_iterations += 1
        # epoch-end flush doubles as an honest sync barrier: fetching the
        # accumulated loss forces every dispatched step of the epoch to
        # complete before train() returns (async dispatch otherwise returns
        # with device work still in flight — PERF.md methodology)
        flush_losses()
        return False

    def should_stop(self) -> bool:
        if self.max_num_iterations < self.num_iterations:
            logger.info(
                f"Maximum number of iterations {self.max_num_iterations} exceeded."
            )
            return True
        min_lr = 1e-6
        if self.current_lr < min_lr:
            logger.info(f"Learning rate below the minimum {min_lr}.")
            return True
        return False

    def validate(self) -> float:
        logger.info("Validating...")
        val_losses = RunningAverage()
        val_scores = RunningAverage()

        for i, t in enumerate(self.loaders["val"]):
            logger.info(f"Validation iteration {i}")
            input, target, weight = self._split_training_batch(t)
            if self._state is None:
                self._init_state(input)
            output, loss = self._eval_step(self._state, input, target, weight)
            val_losses.update(float(jax.device_get(loss)), self._batch_size(input))

            if i % 100 == 0:
                self._log_images(input, target, output, "val_")

            # Parity: raw (un-activated) output scored (reference trainer.py:272).
            eval_score = float(np.asarray(self.eval_criterion(output, target)))
            val_scores.update(eval_score, self._batch_size(input))

            if self.validate_iters is not None and self.validate_iters <= i:
                break

        self._log_stats("val", val_losses.avg, val_scores.avg)
        logger.info(
            f"Validation finished. Loss: {val_losses.avg}. "
            f"Evaluation score: {val_scores.avg}"
        )
        return val_scores.avg

    # -- helpers ------------------------------------------------------------

    def _split_training_batch(self, t):
        """Batch tuple → device-sharded (input, target, weight|None).

        Default layout shards the batch axis over the data mesh axis;
        spatial mode shards ``spatial_shard_axis`` instead (each device
        holds a slab of every volume in the batch)."""
        if len(t) == 2:
            input, target = t
            weight = None
        else:
            input, target, weight = t
        if self.spatial_halo:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def put(v):
                v = np.asarray(v)
                spec = [None] * v.ndim
                spec[self.spatial_shard_axis] = mesh_lib.DATA_AXIS
                return jax.device_put(
                    v, NamedSharding(self.mesh, P(*spec))
                )

            return (
                put(input),
                put(target),
                put(weight) if weight is not None else None,
            )
        sharded = mesh_lib.shard_batch(
            self.mesh,
            {"input": np.asarray(input), "target": np.asarray(target),
             **({"weight": np.asarray(weight)} if weight is not None else {})},
        )
        return (
            sharded["input"],
            sharded["target"],
            sharded.get("weight"),
        )

    def _is_best_eval_score(self, eval_score: float) -> bool:
        if self.eval_score_higher_is_better:
            is_best = eval_score > self.best_eval_score
        else:
            is_best = eval_score < self.best_eval_score
        if is_best:
            logger.info(f"Saving new best evaluation metric: {eval_score}")
            self.best_eval_score = eval_score
        return is_best

    def _save_checkpoint(self, is_best: bool):
        from ..parallel.distributed import is_primary

        if self.tensor_parallel or self.zero1:
            # TP params / ZeRO-1 optimizer moments are physically sharded
            # (model axis / data axis): gathering to host (device_get) fails
            # on non-addressable shards in a multi-host mesh.  Orbax saves
            # the sharded jax.Arrays directly (each host writes its shards)
            # — ALL processes participate.
            from .orbax_ckpt import OrbaxCheckpointer

            if not hasattr(self, "_orbax"):
                self._orbax = OrbaxCheckpointer(
                    os.path.join(self.checkpoint_dir, "orbax")
                )
            self._orbax.save(
                {
                    "num_epochs": self.num_epochs + 1,
                    "num_iterations": self.num_iterations,
                    "model_state_dict": {
                        "params": self._state["params"],
                        "batch_stats": self._state["batch_stats"],
                    },
                    "best_eval_score": self.best_eval_score,
                    "optimizer_state_dict": self._state["opt_state"],
                },
                is_best=is_best,
            )
            return
        if not is_primary():
            return  # replicated state; only process 0 writes
        state = jax.device_get(self._state)
        last_file_path = os.path.join(self.checkpoint_dir, ckpt.LAST_NAME)
        logger.info(f"Saving checkpoint to '{last_file_path}'")
        ckpt.save_checkpoint(
            {
                "num_epochs": self.num_epochs + 1,
                "num_iterations": self.num_iterations,
                "model_state_dict": {
                    "params": state["params"],
                    "batch_stats": state["batch_stats"],
                },
                "best_eval_score": self.best_eval_score,
                "optimizer_state_dict": state["opt_state"],
            },
            is_best,
            checkpoint_dir=self.checkpoint_dir,
        )

    def _log_lr(self):
        self.writer.scalar("learning_rate", self.current_lr, self.num_iterations)

    def _log_stats(
        self, phase: str, loss_avg: float, eval_score_avg: Optional[float]
    ):
        self.writer.scalar(f"{phase}_loss_avg", loss_avg, self.num_iterations)
        if eval_score_avg is not None:  # spatial mode computes no train score
            self.writer.scalar(
                f"{phase}_eval_score_avg", eval_score_avg, self.num_iterations
            )

    def _log_images(self, input, target, prediction, prefix: str = ""):
        final_activation = self.model.final_activation()
        if final_activation is not None:
            prediction = final_activation(prediction)
        inputs_map = {"inputs": input, "targets": target, "predictions": prediction}
        img_sources = {}
        for name, batch in inputs_map.items():
            if batch is None:
                continue
            if isinstance(batch, (list, tuple)):
                for i, b in enumerate(batch):
                    img_sources[f"{name}{i}"] = np.asarray(jax.device_get(b))
            else:
                img_sources[name] = np.asarray(jax.device_get(batch))
        for name, batch in img_sources.items():
            if batch.ndim < 4:
                continue
            for tag, image in self.tensorboard_formatter(name, batch):
                self.writer.image(prefix + tag, image, self.num_iterations)

    @staticmethod
    def _batch_size(input) -> int:
        if isinstance(input, (list, tuple)):
            return input[0].shape[0]
        return input.shape[0]
