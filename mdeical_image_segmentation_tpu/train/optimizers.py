"""Optimizer + LR-scheduler factories (optax), reference-config compatible.

``create_optimizer(optimizer_config)`` accepts the same config dicts as the
reference factory (/root/reference/model/unet3d/utils.py:275-346) — name,
learning_rate, weight_decay plus per-optimizer knobs — and returns an optax
``GradientTransformation`` wrapped in ``inject_hyperparams`` so the learning
rate lives in the optimizer state and can be driven per-step by a scheduler
(the functional replacement for mutating torch param groups).

Torch-parity details:
- torch couples weight decay as L2 (grad += wd * param) for everything except
  AdamW; we chain ``add_decayed_weights`` *before* the optimizer accordingly,
  and use decoupled ``optax.adamw`` for AdamW.
- RMSprop uses eps outside the sqrt (``eps_in_sqrt=False``) like torch.
- Reference quirks NOT replicated (SURVEY.md §7): its 'ASGD' branch passes
  ASGD kwargs to Adamax (a TypeError at runtime) — here 'ASGD' is honest SGD
  with a note; its 'Rprop' silently runs RMSprop(momentum) — here 'Rprop'
  maps to RMSprop with momentum for behavioral parity, documented.

``create_lr_scheduler(lr_config, base_lr)`` reproduces the torch
``lr_scheduler`` classes the reference reflects into (utils.py:349-357) as
host-side controllers with ``.step()`` / ``.step(metric)`` semantics; the
trainer writes ``scheduler.current_lr`` into the injected hyperparams.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Sequence

import optax


def _l2_chain(inner: optax.GradientTransformation, weight_decay: float):
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), inner)
    return inner


def create_optimizer(optimizer_config: Dict[str, Any]) -> optax.GradientTransformation:
    cfg = dict(optimizer_config)
    name = cfg.get("name", "Adam")
    learning_rate = cfg.get("learning_rate", 1e-3)
    weight_decay = cfg.get("weight_decay", 0.0)
    betas = tuple(cfg.get("betas", (0.9, 0.999)))

    def factory(learning_rate):
        if name == "Adadelta":
            return _l2_chain(
                optax.adadelta(learning_rate, rho=cfg.get("rho", 0.9), eps=1e-6),
                weight_decay,
            )
        if name == "Adagrad":
            # torch lr_decay has no optax analog; lr schedules cover it.
            return _l2_chain(optax.adagrad(learning_rate, eps=1e-10), weight_decay)
        if name == "AdamW":
            return optax.adamw(
                learning_rate, b1=betas[0], b2=betas[1], weight_decay=weight_decay
            )
        if name == "SparseAdam":
            # jax grads are dense; plain Adam is the honest equivalent.
            return optax.adam(learning_rate, b1=betas[0], b2=betas[1])
        if name == "Adamax":
            return _l2_chain(
                optax.adamax(learning_rate, b1=betas[0], b2=betas[1]), weight_decay
            )
        if name == "ASGD":
            return _l2_chain(optax.sgd(learning_rate), weight_decay)
        if name == "LBFGS":
            return optax.lbfgs(
                learning_rate,
                memory_size=cfg.get("history_size", 100),
            )
        if name == "NAdam":
            return _l2_chain(
                optax.nadam(learning_rate, b1=betas[0], b2=betas[1]), weight_decay
            )
        if name == "RAdam":
            return _l2_chain(
                optax.radam(learning_rate, b1=betas[0], b2=betas[1]), weight_decay
            )
        if name == "RMSprop":
            return _l2_chain(
                optax.rmsprop(
                    learning_rate,
                    decay=cfg.get("alpha", 0.99),
                    eps=1e-8,
                    eps_in_sqrt=False,
                ),
                weight_decay,
            )
        if name == "Rprop":
            # Reference behavioral parity: its 'Rprop' constructs RMSprop
            # with momentum (utils.py:331-333).
            return _l2_chain(
                optax.rmsprop(
                    learning_rate,
                    eps=1e-8,
                    eps_in_sqrt=False,
                    momentum=cfg.get("momentum", 0) or None,
                ),
                weight_decay,
            )
        if name == "SGD":
            return _l2_chain(
                optax.sgd(
                    learning_rate,
                    momentum=cfg.get("momentum", 0) or None,
                    nesterov=cfg.get("nesterov", False),
                ),
                weight_decay,
            )
        # Adam is the default (reference utils.py:341-345).
        return _l2_chain(
            optax.adam(learning_rate, b1=betas[0], b2=betas[1]), weight_decay
        )

    return optax.inject_hyperparams(factory)(learning_rate=learning_rate)


def set_learning_rate(opt_state, lr: float):
    """Write a new LR into an inject_hyperparams state (returns new state)."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


# ---------------------------------------------------------------------------
# LR schedulers (torch.optim.lr_scheduler semantics, host-side controllers)
# ---------------------------------------------------------------------------


class LRScheduler:
    """Base: tracks ``current_lr``; ``step()`` advances one scheduler epoch."""

    def __init__(self, base_lr: float):
        self.base_lr = base_lr
        self.current_lr = base_lr
        self.last_epoch = 0

    def step(self, metric: Optional[float] = None) -> float:
        self.last_epoch += 1
        self.current_lr = self._compute_lr()
        return self.current_lr

    def _compute_lr(self) -> float:
        return self.current_lr


class StepLR(LRScheduler):
    def __init__(self, base_lr, step_size: int, gamma: float = 0.1):
        super().__init__(base_lr)
        self.step_size = step_size
        self.gamma = gamma

    def _compute_lr(self):
        return self.base_lr * self.gamma ** (self.last_epoch // self.step_size)


class MultiStepLR(LRScheduler):
    def __init__(self, base_lr, milestones: Sequence[int], gamma: float = 0.1):
        super().__init__(base_lr)
        self.milestones = sorted(milestones)
        self.gamma = gamma

    def _compute_lr(self):
        n = sum(1 for m in self.milestones if m <= self.last_epoch)
        return self.base_lr * self.gamma**n


class ExponentialLR(LRScheduler):
    def __init__(self, base_lr, gamma: float):
        super().__init__(base_lr)
        self.gamma = gamma

    def _compute_lr(self):
        return self.base_lr * self.gamma**self.last_epoch


class CosineAnnealingLR(LRScheduler):
    def __init__(self, base_lr, T_max: int, eta_min: float = 0.0):
        super().__init__(base_lr)
        self.T_max = T_max
        self.eta_min = eta_min

    def _compute_lr(self):
        return self.eta_min + 0.5 * (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * self.last_epoch / self.T_max)
        )


class LambdaLR(LRScheduler):
    def __init__(self, base_lr, lr_lambda: Callable[[int], float]):
        super().__init__(base_lr)
        self.lr_lambda = lr_lambda

    def _compute_lr(self):
        return self.base_lr * self.lr_lambda(self.last_epoch)


class ReduceLROnPlateau(LRScheduler):
    """torch ReduceLROnPlateau parity — stepped with the eval metric, as the
    3D trainer does after every validation (reference trainer.py:196-199)."""

    def __init__(
        self,
        base_lr,
        mode: str = "min",
        factor: float = 0.1,
        patience: int = 10,
        threshold: float = 1e-4,
        threshold_mode: str = "rel",
        min_lr: float = 0.0,
        cooldown: int = 0,
    ):
        super().__init__(base_lr)
        assert mode in ("min", "max")
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.min_lr = min_lr
        self.cooldown = cooldown
        self.cooldown_counter = 0
        self.num_bad_epochs = 0
        self.best: Optional[float] = None

    def _is_better(self, metric: float) -> bool:
        # Mirrors torch's _is_better exactly (including the sign behavior for
        # negative metrics): rel/min → metric < best*(1-threshold);
        # rel/max → metric > best*(1+threshold); abs → best ∓ threshold.
        if self.best is None:
            return True
        if self.threshold_mode == "rel":
            if self.mode == "min":
                return metric < self.best * (1.0 - self.threshold)
            return metric > self.best * (1.0 + self.threshold)
        if self.mode == "min":
            return metric < self.best - self.threshold
        return metric > self.best + self.threshold

    def step(self, metric: Optional[float] = None) -> float:
        assert metric is not None, "ReduceLROnPlateau.step requires a metric"
        self.last_epoch += 1
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.current_lr = max(self.current_lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.current_lr


SCHEDULERS = {
    "StepLR": StepLR,
    "MultiStepLR": MultiStepLR,
    "ExponentialLR": ExponentialLR,
    "CosineAnnealingLR": CosineAnnealingLR,
    "LambdaLR": LambdaLR,
    "ReduceLROnPlateau": ReduceLROnPlateau,
}


def create_lr_scheduler(
    lr_config: Optional[Dict[str, Any]], base_lr: float
) -> Optional[LRScheduler]:
    """Reference ``create_lr_scheduler`` parity (utils.py:349-357): name +
    kwargs dispatched into the scheduler classes; None config → None."""
    if lr_config is None:
        return None
    cfg = dict(lr_config)
    name = cfg.pop("name")
    try:
        cls = SCHEDULERS[name]
    except KeyError:
        raise RuntimeError(f"Unsupported lr scheduler: {name!r}") from None
    return cls(base_lr, **cfg)
