"""Round-4f TPU session: remat checkpoint-policy granularity sweep.

save_convs cut the 512² UNet_3Plus config-of-record remat tax to 460 ms
(whole-block 645) and the 3D config-of-record tax to +9% (227.7 vs 209.1
plain).  The remaining recompute under save_convs is the norm+ReLU tail —
this session sweeps the two finer-grained points added to ops/remat.py:

  - save_convs_norms: norm outputs saved too (backward recomputes only
    ReLU/concat/resize from saved tensors)
  - everything: everything_saveable — remat as a *structural* lever only
    (blocks compile as separate subcomputations; zero recompute)

plus the no-remat 512² attempt (expected: remote-compiler failure — that
failure is the reason the config of record runs under remat at all; if it
now compiles, the whole remat question at 512² becomes optional).

In-process anchors re-run the known legs (cross-session deltas <10% are
noise — CLAUDE.md measurement hygiene).  Writes /tmp/tpu_r4f.json after
every leg.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

OUT = {}


def log(k, v):
    OUT[k] = v
    print(json.dumps({k: v})[:2000], flush=True)
    with open("/tmp/tpu_r4f.json", "w") as f:
        json.dump(OUT, f, indent=2)


def build_unet3plus(remat, policy, batch=4, res=512):
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel

    model = UNetModel(
        UNetConfig(in_channels=3, out_channels=1, unet_type="UNet_3Plus",
                   compute_dtype="bfloat16", remat=remat,
                   remat_policy=policy)
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, res, res, 3), jnp.float32)
    y = (x[..., :1] > 0.5).astype(jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.adamw(5e-3, weight_decay=1e-3)
    opt_state = opt.init(params)

    def step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, y, train=True,
                mutable=["batch_stats"],
            )
            return out.loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1, 2))
    return jstep, (params, batch_stats, opt_state, x, y)


def time_u3p(jstep, args, steps=10, batch=4):
    params, batch_stats, opt_state, x, y = args
    t_c = time.time()
    params, batch_stats, opt_state, loss = jstep(
        params, batch_stats, opt_state, x, y
    )
    float(loss)
    compile_s = time.time() - t_c
    t0 = time.time()
    for _ in range(steps):
        params, batch_stats, opt_state, loss = jstep(
            params, batch_stats, opt_state, x, y
        )
    float(loss)
    dt = time.time() - t0
    return {"ms_per_step": round(dt / steps * 1e3, 1),
            "images_per_sec": round(steps * batch / dt, 2),
            "compile_s": round(compile_s, 1)}


def build_unet3d(remat, policy, batch=1, patch=(80, 170, 170)):
    from mdeical_image_segmentation_tpu.losses import BCEDiceLoss
    from mdeical_image_segmentation_tpu.models import get_model

    model = get_model({"name": "UNet3D", "in_channels": 1, "out_channels": 1,
                       "f_maps": 64, "num_levels": 4, "layer_order": "gcr",
                       "dtype": jnp.bfloat16, "remat": remat,
                       "remat_policy": policy})
    criterion = BCEDiceLoss()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, *patch, 1), jnp.float32)
    y = (x > 0.5).astype(jnp.float32)
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

    return (jax.jit(step, donate_argnums=(0, 1)),
            (variables["params"], opt_state, x, y, jax.random.PRNGKey(1)))


def time_3d(jstep, args, steps=12):
    params, opt_state, *rest = args
    t_c = time.time()
    params, opt_state, loss = jstep(params, opt_state, *rest)
    float(loss)
    compile_s = time.time() - t_c
    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = jstep(params, opt_state, *rest)
    float(loss)
    return {"ms_per_step": round((time.time() - t0) / steps * 1e3, 2),
            "compile_s": round(compile_s, 1)}


def main():
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))
    assert jax.default_backend() != "cpu"

    # ---- 512² config of record: policy granularity -----------------------
    for name, remat, policy in (
        ("save_convs", True, "save_convs"),          # in-process anchor (460.4)
        ("save_convs_norms", True, "save_convs_norms"),
        ("everything", True, "everything"),
        ("noremat", False, None),                    # expected: compile failure
    ):
        try:
            jstep, args = build_unet3plus(remat, policy)
            log(f"u3p512_{name}", time_u3p(jstep, args))
            del jstep, args
        except Exception as e:  # noqa: BLE001 — record the failure honestly
            log(f"u3p512_{name}_error", f"{type(e).__name__}: {str(e)[:400]}")

    # ---- 3D config of record: same sweep ---------------------------------
    for name, remat, policy in (
        ("plain", False, None),                      # anchor (209.1)
        ("save_convs", True, "save_convs"),          # anchor (227.7)
        ("save_convs_norms", True, "save_convs_norms"),
        ("everything", True, "everything"),
    ):
        try:
            jstep, args = build_unet3d(remat, policy)
            log(f"cfg3d_{name}", time_3d(jstep, args))
            del jstep, args
        except Exception as e:  # noqa: BLE001
            log(f"cfg3d_{name}_error", f"{type(e).__name__}: {str(e)[:400]}")

    print("DONE", json.dumps(OUT)[:1500], flush=True)


if __name__ == "__main__":
    main()
