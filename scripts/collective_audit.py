"""Collective-byte audit of the sharded train steps (round-4 verdict item 5).

Grounds the scale-out claims ("381 img/s x N chips", "2 chips at base8 clear
the 10k bar") in the actual collectives GSPMD inserts: lowers the REAL
jitted steps over a virtual 8-device mesh (same mechanism as the driver's
dryrun), parses the compiled HLO for all-reduce / all-gather /
reduce-scatter / collective-permute payloads, and projects per-step ICI time
on a v5e ring.

Wire-byte model per chip (ring algorithms over one torus axis):
    all-reduce(P)          2 * (N-1)/N * P
    all-gather(out G)          (N-1)/N * G
    reduce-scatter(in I)       (N-1)/N * I
    collective-permute(C)              C
v5e ICI: 4.5e10 B/s per link per direction (scaling-book number); a 1D ring
all-reduce streams both directions of one axis -> W_axis = 9e10 B/s.

Runs on CPU (compile-only, no TPU needed):
    python scripts/collective_audit.py            # writes /tmp/collective_audit.json
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

N_DEV = 8
W_AXIS = 9e10  # B/s, bidirectional 1D-ring ICI per chip (2 x 4.5e10)

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}
SHAPE_RE = re.compile(
    r"\b(f32|bf16|f16|s32|u32|pred|s8|u8|f64|s64|u64)\[([0-9,]*)\]"
)
COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute")

OUT = {}


def _shape_bytes(dtype, dims):
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES[dtype]


def collective_payloads(hlo_text):
    """Sum output-payload bytes per collective opcode in a compiled HLO."""
    by_op = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"%?[\w.\-]+\s*=\s*(.*)", line)
        if not m:
            continue
        rhs = m.group(1)
        opm = re.search(r"\b(all-reduce|all-gather|reduce-scatter|"
                        r"collective-permute)(?:-start)?\(", rhs)
        if not opm:
            continue
        op = opm.group(1)
        head = rhs[: rhs.index(opm.group(0))]
        payload = sum(_shape_bytes(d, s) for d, s in SHAPE_RE.findall(head))
        if payload:
            by_op[op] = by_op.get(op, 0) + payload
    return by_op


def wire_bytes_per_chip(by_op, n):
    """Ring-model wire bytes per chip for an n-device group."""
    w = 0.0
    w += by_op.get("all-reduce", 0) * 2 * (n - 1) / n
    w += by_op.get("all-gather", 0) * (n - 1) / n
    # reduce-scatter payload parsed is the OUTPUT (shard); input = out * n
    w += by_op.get("reduce-scatter", 0) * n * (n - 1) / n
    w += by_op.get("collective-permute", 0)
    return w


def log(name, by_op, n=N_DEV, step_ms=None):
    wire = wire_bytes_per_chip(by_op, n)
    t_coll_ms = wire / W_AXIS * 1e3
    row = {
        "payload_mb": {k: round(v / 1e6, 2) for k, v in by_op.items()},
        "wire_mb_per_chip": round(wire / 1e6, 2),
        "t_ici_ms": round(t_coll_ms, 3),
    }
    if step_ms:
        row["step_ms_1chip"] = step_ms
        # weak scaling (per-chip batch fixed): serial and overlapped bounds
        row["eff_serial"] = round(step_ms / (step_ms + t_coll_ms), 4)
        row["eff_overlap"] = round(
            step_ms / max(step_ms, t_coll_ms), 4
        )
    OUT[name] = row
    print(json.dumps({name: row}), flush=True)
    with open("/tmp/collective_audit.json", "w") as f:
        json.dump(OUT, f, indent=2)


# --------------------------------------------------------------------------
# 2D Trainer DP steps (the REAL Trainer step: device augs + fwd + bwd + clip
# + AdamW), at the benchmark shapes, via the same path the dryrun runs.
# --------------------------------------------------------------------------


def audit_trainer2d(name, base_features, batch, res, zero1, step_ms):
    from mdeical_image_segmentation_tpu.data import SyntheticSliceDataset
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel
    from mdeical_image_segmentation_tpu.parallel import make_mesh
    from mdeical_image_segmentation_tpu.parallel import mesh as mesh_lib
    from mdeical_image_segmentation_tpu.train import Trainer, TrainingArguments

    mesh = make_mesh(devices=jax.devices("cpu")[:N_DEV])
    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                   base_features=base_features, compute_dtype="bfloat16")
    )
    args = TrainingArguments(
        output_dir="/tmp/coll_audit", max_steps=1,
        per_device_train_batch_size=batch // N_DEV, eval_strategy="no",
        logging_steps=0, save_steps=0, zero1=zero1, bf16=True,
    )
    ds = SyntheticSliceDataset(n_samples=batch, resolution=res)
    trainer = Trainer(model, args, ds, mesh=mesh)
    sample = np.zeros((batch, res, res, 1), np.float32)
    trainer._init_state(sample, total_steps=10)
    trainer._compile_steps()
    batch_arrs = mesh_lib.shard_batch(
        mesh,
        {"images": np.zeros((batch, res, res, 1), np.float32),
         "labels": np.zeros((batch, res, res, 1), np.float32)},
    )
    lowered = trainer._train_step.lower(
        trainer.state, batch_arrs, jax.random.PRNGKey(0)
    )
    hlo = lowered.compile().as_text()
    log(name, collective_payloads(hlo), step_ms=step_ms)
    trainer.close_loaders()


# --------------------------------------------------------------------------
# 3D DP step (bench shape), spatial halo step, TP forward
# --------------------------------------------------------------------------


def audit_3d_dp(step_ms):
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mdeical_image_segmentation_tpu.losses import BCEDiceLoss
    from mdeical_image_segmentation_tpu.models import get_model
    from mdeical_image_segmentation_tpu.parallel import make_mesh

    mesh = make_mesh(devices=jax.devices("cpu")[:N_DEV])
    model = get_model({"name": "UNet3D", "in_channels": 1, "out_channels": 1,
                       "f_maps": 32, "num_levels": 4, "layer_order": "gcr",
                       "dtype": jnp.bfloat16})
    criterion = BCEDiceLoss()
    # per-chip batch 2 (the measured f32 b2 config) -> global 16
    x = jnp.zeros((2 * N_DEV, 64, 128, 128, 1), jnp.float32)
    y = jnp.zeros_like(x)
    variables = model.init(jax.random.PRNGKey(0), x[:1], True)
    opt = optax.adam(1e-3)
    opt_state = opt.init(variables["params"])

    def step(params, opt_state, x, y, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, x, True, rngs={"dropout": rng})
            return criterion(out, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    data_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    jstep = jax.jit(
        step,
        in_shardings=(rep, rep, data_sh, data_sh, rep),
    )
    hlo = jstep.lower(
        variables["params"], opt_state, x, y, jax.random.PRNGKey(1)
    ).compile().as_text()
    log("unet3d_f32_perchip_b2_dp", collective_payloads(hlo),
        step_ms=step_ms)


def audit_spatial(step_ms):
    import optax

    from mdeical_image_segmentation_tpu.models import get_model
    from mdeical_image_segmentation_tpu.parallel import make_mesh
    from mdeical_image_segmentation_tpu.parallel.spatial import (
        make_spatial_train_step,
    )

    mesh = make_mesh(devices=jax.devices("cpu")[:N_DEV])
    model = get_model({"name": "UNet3D", "in_channels": 1, "out_channels": 1,
                       "f_maps": 32, "num_levels": 4, "layer_order": "gcr",
                       "dtype": jnp.bfloat16})
    # one 64 x (128*8) x 128 volume spatially sharded over 8 devices (H axis)
    vol = jnp.zeros((1, 64, 128 * N_DEV, 128, 1), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), vol[:, :, :128], True
    )["params"]
    opt = optax.adam(1e-3)
    step = make_spatial_train_step(
        model, lambda o, y: jnp.mean(jnp.square(o - y)), opt, mesh,
        halo=16, shard_axis=2, cross_shard_norm=True,
    )
    hlo = step.lower(
        params, opt.init(params), vol, vol, jax.random.PRNGKey(0)
    ).compile().as_text()
    log("unet3d_spatial8_halo16", collective_payloads(hlo), step_ms=step_ms)


def audit_tp_forward():
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel
    from mdeical_image_segmentation_tpu.parallel import make_mesh
    from mdeical_image_segmentation_tpu.parallel.tensor import shard_params_tp

    mesh = make_mesh(1, N_DEV, devices=jax.devices("cpu")[:N_DEV])
    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                   base_features=64, compute_dtype="bfloat16")
    )
    x = jnp.zeros((4, 256, 256, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    params_tp = shard_params_tp(variables["params"], mesh)
    fwd = jax.jit(
        lambda p, x: model.apply({"params": p}, x, train=False).logits
    )
    hlo = fwd.lower(params_tp, x).compile().as_text()
    log("unet2d_base64_tp8_fwd_b4", collective_payloads(hlo))


def main():
    # measured single-chip step times (PERF.md, v5e bf16) for the projection
    audit_trainer2d("unet2d_base64_b32_dp", 64, 32, 256, False, step_ms=83.0)
    audit_trainer2d("unet2d_base64_b32_dp_zero1", 64, 32, 256, True,
                    step_ms=83.0)
    audit_trainer2d("unet2d_base8_b256_dp", 8, 256, 256, False, step_ms=42.0)
    audit_3d_dp(step_ms=93.4)
    audit_spatial(step_ms=None)
    audit_tp_forward()
    print("DONE")


if __name__ == "__main__":
    main()
