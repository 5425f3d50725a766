"""Round-4 TPU session: remat checkpoint-policy A/B (verdict item 1).

Measures the reference's 512² UNet_3Plus config of record under
  (a) whole-block remat (round-3 shipped state, BENCH_r03: 644 ms/step)
  (b) remat + save_convs policy (ops/remat.py: conv outputs saved,
      elementwise tail recomputed)
and the classic-UNet remat×policy interaction at base8 (the round-3 remat
sweep measured whole-block remat at −17..22% throughput; save_convs should
eliminate the conv re-reads that caused it).

One long-lived process, value-synced timing (CLAUDE.md measurement hygiene).
Writes /tmp/tpu_r4d.json.
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
    with open("/tmp/tpu_r4d.json", "w") as f:
        json.dump(OUT, f, indent=2)


def bench_unet3plus(remat_policy, batch=4, res=512, steps=10):
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel

    model = UNetModel(
        UNetConfig(in_channels=3, out_channels=1, unet_type="UNet_3Plus",
                   compute_dtype="bfloat16", remat=True,
                   remat_policy=remat_policy)
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


def bench_unet2d(base_features, batch, remat, remat_policy, steps=30, res=256):
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel

    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                   base_features=base_features, compute_dtype="bfloat16",
                   remat=remat, remat_policy=remat_policy)
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, res, res, 1), jnp.float32)
    y = (x > 0.5).astype(jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    opt = optax.adamw(1e-3)
    opt_state = opt.init(variables["params"])

    def step(params, opt_state, x, y):
        def loss_fn(p):
            return model.apply({"params": p}, x, y, train=True).loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    params, opt_state = variables["params"], opt_state
    params, opt_state, loss = jstep(params, opt_state, x, y)
    float(loss)
    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = jstep(params, opt_state, x, y)
    float(loss)
    dt = time.time() - t0
    return {"ms_per_step": round(dt / steps * 1e3, 2),
            "slices_per_sec": round(steps * batch / dt, 1)}


def main():
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))
    assert jax.default_backend() != "cpu"

    # ---- 512² config of record: policy A/B (the driver-graded row) ----
    for policy in (None, "save_convs"):
        tag = policy or "block"
        try:
            log(f"unet3plus_512_remat_{tag}", bench_unet3plus(policy))
        except Exception as e:
            log(f"unet3plus_512_remat_{tag}_error",
                f"{type(e).__name__}: {str(e)[:300]}")

    # ---- classic UNet: does save_convs cure the remat throughput tax? ----
    for bf, batch in ((8, 256), (64, 32)):
        log(f"unet2d_base{bf}_plain",
            bench_unet2d(bf, batch, remat=False, remat_policy=None))
        log(f"unet2d_base{bf}_remat_block",
            bench_unet2d(bf, batch, remat=True, remat_policy=None))
        log(f"unet2d_base{bf}_remat_save_convs",
            bench_unet2d(bf, batch, remat=True, remat_policy="save_convs"))

    print("DONE", json.dumps(OUT)[:1200], flush=True)


if __name__ == "__main__":
    main()
