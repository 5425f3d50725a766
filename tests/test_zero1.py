"""ZeRO-1 optimizer-state sharding (parallel/zero.py) on the 8-device CPU
mesh.

Correctness contract: partitioning the Adam moments over the ``data`` axis
must not change the math — the trained parameters match the replicated run
to float tolerance — while the moment arrays are physically split
(verified via addressable shard shapes).  Composition with channel tensor
parallelism shards moments over both mesh axes at once.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mdeical_image_segmentation_tpu.data import SyntheticSliceDataset
from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel
from mdeical_image_segmentation_tpu.parallel import make_mesh
from mdeical_image_segmentation_tpu.parallel.zero import (
    shard_opt_state_zero1,
    zero1_specs,
)
from mdeical_image_segmentation_tpu.train import Trainer, TrainingArguments


def test_specs_pick_largest_divisible_dim():
    mesh = make_mesh(8, 1)
    tree = {
        "kernel": np.zeros((3, 3, 4, 16)),   # 16 divisible → trailing dim
        "bias": np.zeros((16,)),             # divisible vector
        "odd": np.zeros((3, 3)),             # nothing divisible → replicated
        "count": np.zeros(()),               # scalar → replicated
    }
    specs = zero1_specs(tree, mesh)
    assert specs["kernel"] == P(None, None, None, "data")
    assert specs["bias"] == P("data")
    assert specs["odd"] == P()
    assert specs["count"] == P()


def test_specs_compose_with_tensor_parallel_base():
    mesh = make_mesh(4, 2)
    tree = {"kernel": np.zeros((3, 3, 8, 16))}
    base = {"kernel": P(None, None, None, "model")}
    specs = zero1_specs(tree, mesh, base)
    # model keeps the out-channel dim; data takes the largest remaining (Cin)
    assert specs["kernel"] == P(None, None, "data", "model")


def test_shard_opt_state_splits_moments():
    mesh = make_mesh(8, 1)
    tree = {"mu": np.arange(8 * 4, dtype=np.float32).reshape(8, 4)}
    sharded, specs = shard_opt_state_zero1(tree, mesh)
    assert specs["mu"] == P("data")
    shard = sharded["mu"].addressable_shards[0].data
    assert shard.shape == (1, 4)
    np.testing.assert_array_equal(np.asarray(sharded["mu"]), tree["mu"])


def _train(zero1: bool, tensor_parallel: bool = False, n_model: int = 1):
    train_ds = SyntheticSliceDataset(n_samples=16, resolution=32)
    model = UNetModel(
        UNetConfig(
            in_channels=1, out_channels=1, unet_type="UNet", base_features=8
        )
    )
    args = TrainingArguments(
        output_dir="/tmp/tpuseg_zero1",
        max_steps=6,
        per_device_train_batch_size=2,
        eval_strategy="no",
        logging_steps=0,
        save_steps=0,
        learning_rate=3e-3,
        augment=False,
        zero1=zero1,
        tensor_parallel=tensor_parallel,
    )
    mesh = make_mesh(len(jax.devices()) // n_model, n_model)
    trainer = Trainer(model, args, train_ds, mesh=mesh)
    result = trainer.train()
    return trainer, result


@pytest.fixture(scope="module")
def baseline():
    return _train(zero1=False)


@pytest.fixture(scope="module")
def zero1_run():
    return _train(zero1=True)


def test_moments_physically_sharded(zero1_run):
    trainer, _ = zero1_run
    n_data = trainer.mesh.shape["data"]
    sharded_leaves = [
        v
        for v in jax.tree_util.tree_leaves(trainer.state.opt_state)
        if hasattr(v, "sharding") and "data" in (v.sharding.spec or ())
    ]
    assert sharded_leaves, "no optimizer leaf carries a data-axis partition"
    # the big conv-kernel moments are split: per-device shard is 1/N bytes
    wide = max(sharded_leaves, key=lambda v: v.size)
    assert wide.addressable_shards[0].data.size == wide.size // n_data
    # params stay replicated (ZeRO-1, not ZeRO-3)
    for leaf in jax.tree_util.tree_leaves(trainer.state.params):
        assert leaf.sharding.spec == P()


def test_sharding_survives_the_donated_step(zero1_run):
    trainer, _ = zero1_run
    # after 6 donated steps the constraint must still hold (no silent
    # replication on output)
    specs = jax.tree_util.tree_map(lambda s: s, trainer._opt_specs)
    flat_specs = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, P)
    )
    flat_state = jax.tree_util.tree_leaves(trainer.state.opt_state)
    assert len(flat_specs) == len(flat_state)
    for spec, leaf in zip(flat_specs, flat_state):
        assert leaf.sharding.spec == spec


def test_zero1_matches_replicated_training(baseline, zero1_run):
    ref_trainer, ref_result = baseline
    z_trainer, z_result = zero1_run
    assert np.isclose(
        ref_result.training_loss, z_result.training_loss, rtol=1e-5
    )
    ref_params = jax.device_get(ref_trainer.state.params)
    z_params = jax.device_get(z_trainer.state.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_params),
        jax.tree_util.tree_leaves(z_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-6)


def test_zero1_composes_with_tensor_parallel():
    trainer, result = _train(zero1=True, tensor_parallel=True, n_model=2)
    assert np.isfinite(result.training_loss)
    both = [
        v
        for v in jax.tree_util.tree_leaves(trainer.state.opt_state)
        if hasattr(v, "sharding")
        and {"data", "model"} <= set(
            ax for ax in (v.sharding.spec or ()) if ax is not None
        )
    ]
    assert both, "no moment leaf is sharded over both mesh axes"
