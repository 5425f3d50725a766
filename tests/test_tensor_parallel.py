"""Channel tensor-parallelism (parallel/tensor.py) on the 8-device CPU mesh.

Correctness contract: sharding the params must not change the math — the
jitted forward and the parameter gradients match the replicated run to
float tolerance, while the param arrays are physically split over the
``model`` axis (verified via addressable shard shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel
from mdeical_image_segmentation_tpu.parallel import make_mesh
from mdeical_image_segmentation_tpu.parallel.tensor import (
    shard_params_tp, tp_param_specs)


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(2, 4)
    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                   base_features=8)
    )
    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 32, 32, 1), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    return mesh, model, x, variables


def test_specs_shard_out_channels(setup):
    mesh, model, x, variables = setup
    specs = tp_param_specs(variables["params"], mesh)
    leaves = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, P)
    )
    # the wide conv kernels are sharded on their trailing (out-channel) dim
    assert any(s == P(None, None, None, "model") for s in leaves)
    # the 1-channel head stays replicated
    assert any(s == P() for s in leaves)


def test_tp_forward_matches_replicated(setup):
    mesh, model, x, variables = setup
    ref = np.asarray(model.apply(variables, x, train=False).logits)

    params_tp = shard_params_tp(variables["params"], mesh)
    # physically split: a sharded kernel's per-device shard is 1/4 width
    wide = [
        v for v in jax.tree_util.tree_leaves(params_tp)
        if v.ndim == 4 and v.shape[-1] % 4 == 0 and v.shape[-1] >= 8
    ][0]
    shard_shape = wide.addressable_shards[0].data.shape
    assert shard_shape[-1] == wide.shape[-1] // 4

    others = {k: v for k, v in variables.items() if k != "params"}

    @jax.jit
    def fwd(p, x):
        return model.apply({"params": p, **others}, x, train=False).logits

    out = np.asarray(fwd(params_tp, x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_tp_gradients_match_replicated(setup):
    mesh, model, x, variables = setup
    others = {k: v for k, v in variables.items() if k != "params"}

    def loss(p):
        out = model.apply({"params": p, **others}, x, train=False).logits
        return jnp.mean(jnp.square(out))

    g_ref = jax.grad(loss)(variables["params"])
    params_tp = shard_params_tp(variables["params"], mesh)
    g_tp = jax.jit(jax.grad(loss))(params_tp)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
        ),
        g_ref, g_tp,
    )
    # gradient sharding follows the param sharding (no silent gather-back)
    wide_pairs = [
        (a, b) for a, b in zip(
            jax.tree_util.tree_leaves(params_tp),
            jax.tree_util.tree_leaves(g_tp),
        ) if a.ndim == 4 and a.shape[-1] >= 8
    ]
    a, b = wide_pairs[0]
    assert b.sharding.is_equivalent_to(a.sharding, a.ndim)


@pytest.mark.slow  # opt-in (tensor_parallel=True) path; ~60 s of TP trainer
# compiles.  Default-tier guards: test_tp_gradients_match_replicated here
# and test_trainer3d::test_tensor_parallel_config.
def test_trainer_tensor_parallel_e2e():
    """Full Trainer with tensor_parallel=True on a (2, 4) mesh: runs, and the
    per-step losses match the replicated-params run to float tolerance
    (sharding must not change the math)."""
    from mdeical_image_segmentation_tpu.data import SyntheticSliceDataset
    from mdeical_image_segmentation_tpu.train import Trainer, TrainingArguments

    def run(tp):
        mesh = make_mesh(2, 4)
        model = UNetModel(
            UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                       base_features=8)
        )
        args = TrainingArguments(
            output_dir="/tmp/tpuseg_tp_test",
            max_steps=3,
            per_device_train_batch_size=1,
            eval_strategy="no",
            logging_steps=0,
            save_steps=0,
            augment=False,
            tensor_parallel=tp,
        )
        dataset = SyntheticSliceDataset(n_samples=4, resolution=32)
        trainer = Trainer(model, args, dataset, mesh=mesh)
        out = trainer.train()
        # a wide conv kernel is physically split over the model axis iff tp
        wide = [
            v for v in jax.tree_util.tree_leaves(trainer.state.params)
            if v.ndim == 4 and v.shape[-1] >= 8
        ][0]
        n_shards = wide.shape[-1] // wide.addressable_shards[0].data.shape[-1]
        return out, n_shards

    out_tp, shards_tp = run(True)
    out_rep, shards_rep = run(False)
    assert shards_tp == 4 and shards_rep == 1
    assert out_tp.global_step == 3
    np.testing.assert_allclose(
        out_tp.training_loss, out_rep.training_loss, rtol=2e-4
    )
