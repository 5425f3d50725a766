"""Config-driven 3D trainer: end-to-end fit() on synthetic H5 volumes over
the CPU mesh — loss decreases, checkpoints written, resume restores state,
ReduceLROnPlateau drives the injected LR, lr-floor stop works."""

import json
import os

import h5py
import numpy as np
import pytest
import yaml

from mdeical_image_segmentation_tpu.train.trainer3d import create_trainer


def _phase(fp):
    return {
        "transformer": {
            "raw": [{"name": "Standardize"}, {"name": "ToTensor", "expand_dims": True}],
            "label": [{"name": "ToTensor", "expand_dims": True}],
        },
        "slice_builder": {"name": "SliceBuilder", "patch_shape": [8, 32, 32],
                          "stride_shape": [8, 32, 32], "skip_shape_check": True},
        "file_paths": [fp],
    }


@pytest.fixture(scope="module")
def volumes(tmp_path_factory):
    root = tmp_path_factory.mktemp("t3d")
    rs = np.random.RandomState(0)
    paths = {}
    for name in ("train", "val"):
        p = str(root / f"{name}.h5")
        raw = rs.rand(16, 64, 64).astype(np.float32)
        with h5py.File(p, "w") as f:
            f.create_dataset("raw", data=raw)
            f.create_dataset("label", data=(raw > 0.6).astype(np.uint8))
        paths[name] = p
    return paths


def _config(volumes, ckpt_dir, **trainer_overrides):
    trainer = {
        "checkpoint_dir": ckpt_dir,
        "max_num_epochs": 3,
        "max_num_iterations": 20,
        "validate_after_iters": 2,
        "log_after_iters": 2,
    }
    trainer.update(trainer_overrides)
    return {
        "model": {"name": "UNet3D", "in_channels": 1, "out_channels": 1,
                  "f_maps": 8, "num_levels": 2, "final_sigmoid": True},
        "loss": {"name": "BCEDiceLoss"},
        "eval_metric": {"name": "MeanIoU"},
        "optimizer": {"name": "Adam", "learning_rate": 2e-3},
        "lr_scheduler": {"name": "ReduceLROnPlateau", "mode": "max",
                         "factor": 0.5, "patience": 2},
        "trainer": trainer,
        "loaders": {"dataset": "StandardHDF5Dataset", "batch_size": 2,
                    "train": _phase(volumes["train"]),
                    "val": _phase(volumes["val"])},
    }


@pytest.fixture(scope="module")
def fitted(volumes, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    trainer = create_trainer(_config(volumes, ckpt))
    trainer.fit()
    return trainer, ckpt


def test_checkpoints_written(fitted):
    _, ckpt = fitted
    assert os.path.exists(os.path.join(ckpt, "last_checkpoint.msgpack"))
    assert os.path.exists(os.path.join(ckpt, "best_checkpoint.msgpack"))


def test_training_progressed(fitted):
    trainer, _ = fitted
    assert trainer.num_iterations > 1
    assert np.isfinite(trainer.best_eval_score)


def test_metrics_logged(fitted):
    trainer, ckpt = fitted
    logs = []
    for root, _, files in os.walk(os.path.join(ckpt, "logs")):
        for f in files:
            if f == "metrics.jsonl":
                logs.append(os.path.join(root, f))
    assert logs
    tags = {json.loads(l)["tag"] for l in open(logs[0])}
    assert {"train_loss_avg", "val_eval_score_avg", "learning_rate"} <= tags


def test_resume_continues(volumes, fitted, tmp_path):
    """Resume restores the save point and trains the REMAINING epochs only
    (the pre-fix overrun ran max_num_epochs extra epochs, masking this)."""
    trainer, ckpt = fitted
    iters_before = trainer.num_iterations
    cfg = _config(volumes, str(tmp_path / "elsewhere"), max_num_epochs=8,
                  resume=os.path.join(ckpt, "last_checkpoint.msgpack"))
    t2 = create_trainer(cfg)
    # logs/config must land in the resumed run's dir, not the configured
    # checkpoint_dir — pre-fix a resume with a different checkpoint_dir
    # split its artifacts across two directories (round-3 review finding)
    assert t2.checkpoint_dir == ckpt
    assert t2.writer.log_dir.startswith(os.path.join(ckpt, "logs"))
    t2.fit()
    # trained past the original run's end AND respected the epoch cap
    assert t2.num_iterations >= iters_before
    assert t2.num_epochs <= 8


def test_lr_floor_stops_training(volumes, tmp_path):
    ckpt = str(tmp_path / "ckpt_floor")
    cfg = _config(volumes, ckpt, max_num_epochs=50, max_num_iterations=10_000)
    cfg["optimizer"]["learning_rate"] = 1e-7  # below the 1e-6 floor
    cfg.pop("lr_scheduler")
    trainer = create_trainer(cfg)
    trainer.fit()
    assert trainer.num_iterations <= 2  # stops immediately at the floor


def test_preemption_checkpoints_and_resumes(volumes, tmp_path):
    """SIGTERM-style stop: checkpoint written mid-training, resume continues."""
    import threading

    ckpt = str(tmp_path / "ckpt_preempt")
    cfg = _config(volumes, ckpt, max_num_epochs=100, max_num_iterations=10_000,
                  validate_after_iters=10_000, log_after_iters=10_000)
    trainer = create_trainer(cfg)
    trainer.install_preemption_handler(signals=())  # no real signals in test
    threading.Timer(2.0, trainer.request_stop).start()
    trainer.fit()
    assert os.path.exists(os.path.join(ckpt, "last_checkpoint.msgpack"))
    iters = trainer.num_iterations
    assert iters < 10_000  # stopped early

    cfg2 = _config(volumes, ckpt, max_num_epochs=100, max_num_iterations=iters + 2,
                   resume=os.path.join(ckpt, "last_checkpoint.msgpack"))
    t2 = create_trainer(cfg2)
    t2.fit()
    assert t2.num_iterations >= iters


def test_tensor_parallel_config(volumes, tmp_path_factory):
    """`parallel: {model_axis: 4, tensor_parallel: true}` builds a (2, 4)
    mesh, physically shards the conv kernels over the model axis, and the
    fit loop runs to completion."""
    import jax

    ckpt = str(tmp_path_factory.mktemp("ckpt_tp"))
    cfg = _config(volumes, ckpt, max_num_epochs=1, max_num_iterations=4)
    cfg["parallel"] = {"model_axis": 4, "tensor_parallel": True}
    trainer = create_trainer(cfg)
    assert trainer.mesh.shape == {"data": 2, "model": 4}
    trainer.fit()
    wide = [
        v for v in jax.tree_util.tree_leaves(trainer._state["params"])
        if v.ndim == 5 and v.shape[-1] >= 8
    ][0]
    assert wide.addressable_shards[0].data.shape[-1] == wide.shape[-1] // 4
    assert trainer.num_iterations > 1


def test_zero1_config(volumes, tmp_path_factory):
    """`parallel: {zero1: true}` partitions the Adam moments over the data
    axis (parallel/zero.py): training runs, the big moment leaves are
    physically split 1/8 per device, params stay replicated, and the
    partition survives the donated step + checkpoint write.  ZeRO-sharded
    opt state must save via the orbax (sharded, multi-host-safe) branch —
    a host device_get of non-addressable moment shards would fail on a
    multi-host mesh (advisor round-3 finding)."""
    import jax
    from jax.sharding import PartitionSpec as P

    ckpt = str(tmp_path_factory.mktemp("ckpt_z1"))
    # validate_after_iters=1 so the checkpoint save runs within this
    # 1-iteration-per-epoch config
    cfg = _config(volumes, ckpt, max_num_epochs=1, max_num_iterations=4,
                  validate_after_iters=1)
    cfg["parallel"] = {"zero1": True}
    trainer = create_trainer(cfg)
    assert trainer.zero1
    trainer.fit()
    assert trainer.num_iterations > 1
    n_data = trainer.mesh.shape["data"]
    sharded = [
        v for v in jax.tree_util.tree_leaves(trainer._state["opt_state"])
        if hasattr(v, "sharding") and "data" in tuple(v.sharding.spec or ())
    ]
    assert sharded, "no moment leaf carries a data-axis partition"
    wide = max(sharded, key=lambda v: v.size)
    assert wide.addressable_shards[0].data.size == wide.size // n_data
    for leaf in jax.tree_util.tree_leaves(trainer._state["params"]):
        assert leaf.sharding.spec == P()
    # zero1 routes to the orbax (sharded-save) branch, not msgpack
    assert os.path.exists(os.path.join(ckpt, "orbax", "last"))
    assert not os.path.exists(os.path.join(ckpt, "last_checkpoint.msgpack"))


def test_spatial_halo_config(volumes, tmp_path_factory):
    """`parallel: {spatial_halo: 2}` trains each batch as ONE spatially-
    sharded volume (H slabs over the 8 data devices, ppermute halo
    exchange) through the config-driven trainer; loss decreases and
    checkpoints are written."""
    ckpt = str(tmp_path_factory.mktemp("ckpt_sp"))
    cfg = _config(volumes, ckpt, max_num_epochs=2, max_num_iterations=8,
                  validate_after_iters=4)
    cfg["parallel"] = {"spatial_halo": 2}
    trainer = create_trainer(cfg)
    assert trainer.spatial_halo == 2
    trainer.fit()
    assert trainer.num_iterations > 1
    assert os.path.exists(os.path.join(ckpt, "last_checkpoint.msgpack"))


def test_tensor_parallel_orbax_checkpoint_roundtrip(volumes, tmp_path_factory):
    """TP-sharded state saves via orbax (no host gather — the multi-host-safe
    path) and resumes with shardings intact."""
    import jax

    ckpt = str(tmp_path_factory.mktemp("ckpt_tp_oc"))
    cfg = _config(volumes, ckpt, max_num_epochs=1, max_num_iterations=4,
                  validate_after_iters=2)
    cfg["parallel"] = {"model_axis": 4, "tensor_parallel": True}
    trainer = create_trainer(cfg)
    trainer.fit()
    orbax_dir = os.path.join(ckpt, "orbax")
    assert os.path.exists(os.path.join(orbax_dir, "last"))

    cfg2 = _config(volumes, ckpt, max_num_epochs=1, max_num_iterations=4)
    cfg2["parallel"] = {"model_axis": 4, "tensor_parallel": True}
    cfg2["trainer"]["resume"] = orbax_dir
    trainer2 = create_trainer(cfg2)
    batch = next(iter(trainer2.loaders["train"]))
    input, _, _ = trainer2._split_training_batch(batch)
    trainer2._init_state(input)
    # restored to the SAVE point (the msgpack scheme's semantics too):
    # the last validate/save fired at iteration 2 of the 2-iteration epoch
    assert trainer2.num_iterations == 2
    wide = [
        v for v in jax.tree_util.tree_leaves(trainer2._state["params"])
        if v.ndim == 5 and v.shape[-1] >= 8
    ][0]
    assert wide.addressable_shards[0].data.shape[-1] == wide.shape[-1] // 4
    # restored params equal the fitted ones
    a = jax.tree_util.tree_leaves(trainer._state["params"])[0]
    b = jax.tree_util.tree_leaves(trainer2._state["params"])[0]
    import numpy as np
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_resume_does_not_overrun_max_epochs(volumes, tmp_path):
    """Regression: fit() must re-check num_epochs AFTER the lazy restore —
    a pre-captured range(num_epochs, max) ran max_num_epochs EXTRA epochs
    on every resume."""
    ckpt = str(tmp_path / "ckpt_overrun")
    cfg = _config(volumes, ckpt, max_num_epochs=2, max_num_iterations=10_000,
                  validate_after_iters=1)
    t1 = create_trainer(cfg)
    t1.fit()

    cfg2 = _config(volumes, ckpt, max_num_epochs=3, max_num_iterations=10_000,
                   validate_after_iters=1,
                   resume=os.path.join(ckpt, "last_checkpoint.msgpack"))
    t2 = create_trainer(cfg2)
    t2.fit()
    # restored at the epoch-2 save point, then ran AT MOST 1 remaining epoch
    # (the pre-fix range loop would have run 3 more, ending at 5)
    assert t2.num_epochs <= 3, t2.num_epochs


def test_shard_batch_tail_batch_replicates():
    """Eval tail batches not divisible by the data-mesh width must not
    crash (regression: 3D validation with a 2-patch val set on the
    8-device mesh raised at device_put) — they fall back to replicated
    sharding, keeping loss/metric semantics exact with no padding."""
    import jax
    import numpy as np

    from mdeical_image_segmentation_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()
    n_data = mesh.shape[mesh_lib.DATA_AXIS]
    assert n_data == 8

    odd = {"input": np.ones((2, 4, 8, 8, 1), np.float32),
           "target": np.ones((2, 4, 8, 8, 1), np.float32)}
    sharded = mesh_lib.shard_batch(mesh, odd)
    assert sharded["input"].shape == (2, 4, 8, 8, 1)
    assert sharded["input"].sharding.is_fully_replicated

    even = {"input": np.ones((8, 4, 8, 8, 1), np.float32)}
    sharded = mesh_lib.shard_batch(mesh, even)
    assert not sharded["input"].sharding.is_fully_replicated


def test_lazy_loss_flush_matches_per_step_average(volumes, tmp_path):
    """The device-side loss accumulator (one host fetch per log/validate
    boundary) must log the SAME train_loss_avg as per-step fetching — run
    two identical trainers that differ only in log cadence and compare the
    running average both log at the common boundary (iteration 4).

    The loader scales the global batch with the mesh width (loaders.py), so
    the train volume is sized off jax.device_count() to guarantee >= 4
    steps inside the single epoch on any mesh (the shared module fixture's
    8 patches collapse to 1 step/epoch on the conftest's 8-device mesh)."""
    import jax

    global_batch = 2 * jax.device_count()
    # patch grid (k, 4, 4) over a (8k, 64, 64) volume with 8x16x16 patches
    # -> 16k patches; pick k so >= 4 full global batches exist
    k = -(-4 * global_batch // 16)
    p = str(tmp_path / "train_scaled.h5")
    raw = np.random.RandomState(3).rand(8 * k, 64, 64).astype(np.float32)
    with h5py.File(p, "w") as f:
        f.create_dataset("raw", data=raw)
        f.create_dataset("label", data=(raw > 0.6).astype(np.uint8))
    phase = _phase(p)
    phase["slice_builder"] = {"name": "SliceBuilder",
                              "patch_shape": [8, 16, 16],
                              "stride_shape": [8, 16, 16],
                              "skip_shape_check": True}

    def logged(ckpt, log_every):
        cfg = _config(volumes, ckpt, max_num_epochs=1, max_num_iterations=8,
                      validate_after_iters=100, log_after_iters=log_every)
        cfg["loaders"]["train"] = phase
        create_trainer(cfg).fit()
        rows = {}
        for root, _, files in os.walk(os.path.join(ckpt, "logs")):
            for f in files:
                if f == "metrics.jsonl":
                    for line in open(os.path.join(root, f)):
                        r = json.loads(line)
                        if r["tag"] == "train_loss_avg":
                            rows[r["step"]] = r["value"]
        return rows

    every1 = logged(str(tmp_path / "a"), 1)
    every4 = logged(str(tmp_path / "b"), 4)
    assert 4 in every1 and 4 in every4
    np.testing.assert_allclose(every1[4], every4[4], rtol=1e-5)
