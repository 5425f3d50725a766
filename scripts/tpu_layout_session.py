"""TPU experiment: AUTO layouts for the donated train state.

The profile (PERF.md / tpu_profile_session) showed 22 ms/step (27%) of
layout-conversion copies: the optimizer state lives in default row-major
layouts while the convs want transposed kernel layouts, so XLA re-lays every
weight out twice per step.  `jax.experimental.layout.Format(Layout.AUTO)` on
the donated state lets the compiler keep parameters and optimizer moments in
the conv-preferred layout across steps.

Measures baseline vs auto-layout step time, plus bf16 optimizer moments.
Writes /tmp/tpu_layout.json.
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
from jax.experimental.layout import Format, Layout

RESULTS = {}


def log(k, v):
    RESULTS[k] = v
    print(json.dumps({k: v}), flush=True)
    with open("/tmp/tpu_layout.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def build(base=64, batch=32, res=256, mu_dtype=None):
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel

    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                   base_features=base, compute_dtype="bfloat16")
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, res, res, 1), jnp.float32)
    y = (x > 0.5).astype(jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    opt = optax.adamw(1e-3, mu_dtype=mu_dtype)
    opt_state = opt.init(variables["params"])

    def step(params, opt_state, x, y):
        def loss_fn(p):
            return model.apply({"params": p}, x, y, train=True).loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step, variables["params"], opt_state, x, y


def time_steps(jstep, params, opt_state, x, y, steps=40):
    params, opt_state, loss = jstep(params, opt_state, x, y)
    float(loss)
    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = jstep(params, opt_state, x, y)
    float(loss)
    return (time.time() - t0) / steps * 1e3


def main():
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))

    # baseline (fresh state per experiment — donation deletes the inputs)
    step, params, opt_state, x, y = build()
    jstep = jax.jit(step, donate_argnums=(0, 1))
    log("baseline_ms", round(time_steps(jstep, params, opt_state, x, y), 2))

    # AUTO layouts on the donated state (params + opt_state), default for data
    auto = Format(Layout.AUTO)
    try:
        step, params, opt_state, x, y = build()
        jstep_auto = jax.jit(
            step, donate_argnums=(0, 1),
            in_shardings=(auto, auto, None, None),
            out_shardings=(auto, auto, None),
        )
        ms = time_steps(jstep_auto, params, opt_state, x, y)
        log("auto_layout_ms", round(ms, 2))
    except Exception as e:
        log("auto_layout_ms", f"{type(e).__name__}: {str(e)[:300]}")

    # bf16 first moment (HBM traffic cut on the optimizer path)
    step2, params2, opt_state2, x2, y2 = build(mu_dtype=jnp.bfloat16)
    jstep2 = jax.jit(step2, donate_argnums=(0, 1))
    log("bf16_mu_ms", round(time_steps(jstep2, params2, opt_state2, x2, y2), 2))

    # combined
    try:
        step2, params2, opt_state2, x2, y2 = build(mu_dtype=jnp.bfloat16)
        jstep3 = jax.jit(
            step2, donate_argnums=(0, 1),
            in_shardings=(auto, auto, None, None),
            out_shardings=(auto, auto, None),
        )
        log("auto_plus_bf16mu_ms",
            round(time_steps(jstep3, params2, opt_state2, x2, y2), 2))
    except Exception as e:
        log("auto_plus_bf16mu_ms", f"{type(e).__name__}: {str(e)[:300]}")

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
