"""Optimizer/LR-scheduler factories: all reference names construct and step;
torch-parity spot checks (SGD+momentum L2 coupling vs torch); scheduler
math incl. ReduceLROnPlateau patience behavior."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from mdeical_image_segmentation_tpu.train.optimizers import (
    CosineAnnealingLR,
    ExponentialLR,
    MultiStepLR,
    ReduceLROnPlateau,
    StepLR,
    create_lr_scheduler,
    create_optimizer,
    get_learning_rate,
    set_learning_rate,
)

ALL_NAMES = [
    "Adadelta", "Adagrad", "AdamW", "SparseAdam", "Adamax", "ASGD",
    "NAdam", "RAdam", "RMSprop", "Rprop", "SGD", "Adam",
]


@pytest.mark.parametrize("name", ALL_NAMES)
def test_every_optimizer_constructs_and_steps(name):
    opt = create_optimizer({"name": name, "learning_rate": 1e-2,
                            "weight_decay": 1e-4})
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = opt.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert float(jnp.abs(new["w"] - params["w"]).max()) > 0


def test_lr_injection():
    opt = create_optimizer({"name": "Adam", "learning_rate": 1e-2})
    params = {"w": jnp.ones((2,))}
    state = opt.init(params)
    assert get_learning_rate(state) == pytest.approx(1e-2)
    state = set_learning_rate(state, 5e-3)
    assert get_learning_rate(state) == pytest.approx(5e-3)


def test_sgd_momentum_matches_torch():
    """L2-coupled SGD+momentum: 3 steps vs torch on identical grads."""
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    grads = [np.array(g, np.float32) for g in ([0.5, -1.0, 2.0], [1.0, 1.0, -1.0], [-0.5, 0.25, 0.0])]

    tw = torch.tensor(w0, requires_grad=True)
    topt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, weight_decay=0.01)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()

    opt = create_optimizer({"name": "SGD", "learning_rate": 0.1,
                            "momentum": 0.9, "weight_decay": 0.01})
    params = jnp.asarray(w0)
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(), rtol=1e-5)


def test_adam_matches_torch():
    w0 = np.array([1.0, -2.0], np.float32)
    grads = [np.array(g, np.float32) for g in ([0.5, -1.0], [1.0, 1.0])]
    tw = torch.tensor(w0, requires_grad=True)
    topt = torch.optim.Adam([tw], lr=0.01)
    for g in grads:
        topt.zero_grad(); tw.grad = torch.tensor(g); topt.step()
    opt = create_optimizer({"name": "Adam", "learning_rate": 0.01})
    params = jnp.asarray(w0)
    state = opt.init(params)
    for g in grads:
        u, state = opt.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, u)
    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(), rtol=1e-5)


class TestSchedulers:
    def test_step_lr(self):
        s = StepLR(1.0, step_size=2, gamma=0.1)
        lrs = [s.step() for _ in range(5)]
        assert lrs == pytest.approx([1.0, 0.1, 0.1, 0.01, 0.01])

    def test_multistep(self):
        s = MultiStepLR(1.0, milestones=[2, 4], gamma=0.5)
        lrs = [s.step() for _ in range(5)]
        assert lrs == pytest.approx([1.0, 0.5, 0.5, 0.25, 0.25])

    def test_exponential(self):
        s = ExponentialLR(1.0, gamma=0.9)
        assert s.step() == pytest.approx(0.9)
        assert s.step() == pytest.approx(0.81)

    def test_cosine(self):
        s = CosineAnnealingLR(1.0, T_max=10, eta_min=0.0)
        mid = [s.step() for _ in range(10)][-1]
        assert mid == pytest.approx(0.0, abs=1e-9)

    def test_plateau_patience(self):
        s = ReduceLROnPlateau(1.0, mode="max", factor=0.1, patience=2)
        # improving: no reduction
        for v in (0.1, 0.2, 0.3):
            assert s.step(v) == 1.0
        # stagnating: reduce after patience+1 bad epochs
        assert s.step(0.3) == 1.0
        assert s.step(0.3) == 1.0
        assert s.step(0.3) == pytest.approx(0.1)

    def test_plateau_min_lr(self):
        s = ReduceLROnPlateau(1e-3, mode="min", factor=0.1, patience=0,
                              min_lr=1e-4)
        s.step(1.0)
        s.step(2.0)  # worse → reduce
        s.step(3.0)
        assert s.current_lr >= 1e-4

    def test_factory(self):
        s = create_lr_scheduler({"name": "StepLR", "step_size": 3}, 0.5)
        assert isinstance(s, StepLR)
        assert create_lr_scheduler(None, 0.5) is None
        with pytest.raises(RuntimeError):
            create_lr_scheduler({"name": "Nope"}, 0.5)


def test_plateau_negative_metric_torch_parity():
    """rel-threshold comparisons must match torch for negative metrics
    (torch: min → metric < best*(1-threshold))."""
    import torch

    t_opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    t_sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        t_opt, mode="min", factor=0.5, patience=1, threshold=0.1
    )
    ours = ReduceLROnPlateau(
        1.0, mode="min", factor=0.5, patience=1, threshold=0.1
    )
    # negative metrics: torch's bar is best*(1-thr) = -0.9*best-ish, i.e.
    # *easier* to beat than best - thr*|best|
    for m in [-1.0, -1.05, -1.08, -1.1, -1.12, -1.2, -1.2, -1.2, -1.3]:
        t_sched.step(m)
        lr = ours.step(m)
        assert lr == pytest.approx(t_opt.param_groups[0]["lr"]), m


def test_plateau_negative_metric_max_mode_torch_parity():
    import torch

    t_opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    t_sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        t_opt, mode="max", factor=0.5, patience=0, threshold=0.2
    )
    ours = ReduceLROnPlateau(1.0, mode="max", factor=0.5, patience=0, threshold=0.2)
    for m in [-1.0, -0.9, -0.85, -0.7, -0.7, -0.5]:
        t_sched.step(m)
        lr = ours.step(m)
        assert lr == pytest.approx(t_opt.param_groups[0]["lr"]), m
