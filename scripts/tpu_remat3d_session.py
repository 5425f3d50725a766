"""3D remat-policy A/B at the reference config of record.

Round 2 measured whole-block remat at +31% step time on the 3D config of
record (80×170×170 f64 b1: 235.2 → 307.9 ms) — the tax that makes
larger-than-HBM patches expensive.  Round 4's save_convs checkpoint policy
(ops/remat.py) cut the 2D 512² config's remat cost 1.40×; this session
measures the same policy on the 3D family:

  legs: no remat / remat whole-block / remat save_convs, one process.

Writes /tmp/tpu_remat3d.json.
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
    print(json.dumps({k: v}), flush=True)
    with open("/tmp/tpu_remat3d.json", "w") as f:
        json.dump(OUT, f, indent=2)


def build(remat, policy, batch=1, patch=(80, 170, 170)):
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

    return (jax.jit(step, donate_argnums=(0, 1)), variables["params"],
            opt_state, x, y, jax.random.PRNGKey(1))


def time_train(jstep, args, steps=12):
    params, opt_state, *rest = args
    t0 = time.time()
    params, opt_state, loss = jstep(params, opt_state, *rest)
    float(loss)
    log_compile = time.time() - t0
    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = jstep(params, opt_state, *rest)
    float(loss)
    return (time.time() - t0) / steps * 1e3, log_compile


def main():
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))
    assert jax.default_backend() != "cpu"

    legs = [
        ("plain", False, None),
        ("remat_block", True, None),
        ("remat_save_convs", True, "save_convs"),
    ]
    for name, remat, policy in legs:
        jstep, p, o, x, y, k = build(remat, policy)
        ms, comp = time_train(jstep, (p, o, x, y, k))
        log(f"cfg_record_{name}_ms", round(ms, 2))
        log(f"cfg_record_{name}_compile_s", round(comp, 1))
        del jstep, p, o, x, y, k

    # The payoff case: a patch that does NOT fit without remat.  Round 2's
    # note says b2 at this geometry OOMs; check that remat+save_convs makes
    # the 2x patch trainable and at what rate.
    try:
        jstep, p, o, x, y, k = build(True, "save_convs", batch=2)
        ms, comp = time_train(jstep, (p, o, x, y, k), steps=8)
        log("cfg_record_b2_save_convs_ms", round(ms, 2))
        log("cfg_record_b2_save_convs_compile_s", round(comp, 1))
        del jstep, p, o, x, y, k
    except Exception as e:  # noqa: BLE001 - record OOM honestly
        log("cfg_record_b2_save_convs_error", str(e)[:300])

    print("DONE", json.dumps(OUT), flush=True)


if __name__ == "__main__":
    main()
