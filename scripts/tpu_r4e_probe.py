"""Round-4e probe: pin down two noisy r4c rows before recording them.

1. UNet3D 32 b2 inference fwd showed 62.1 / 62.5 / 36.0 ms across three
   fresh processes — time it with a long warmup and 100 reps to find the
   steady state (tunnel contention shows up as a bimodal first block).
2. UNet3D 64 b2 train re-measured 229.3 ms under the depth2d pool default
   vs 210.7 pre-depth2d — A/B TPUSEG_POOL=depth2d vs native in ONE
   process to separate the pool mode from session variance.

Writes /tmp/tpu_r4e.json.
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
    with open("/tmp/tpu_r4e.json", "w") as f:
        json.dump(OUT, f, indent=2)


def build_train(f_maps, batch):
    from mdeical_image_segmentation_tpu.losses import BCEDiceLoss
    from mdeical_image_segmentation_tpu.models import get_model

    model = get_model({"name": "UNet3D", "in_channels": 1, "out_channels": 1,
                       "f_maps": f_maps, "num_levels": 4,
                       "layer_order": "gcr", "dtype": jnp.bfloat16})
    criterion = BCEDiceLoss()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 64, 128, 128, 1), jnp.float32)
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

    jstep = jax.jit(step, donate_argnums=(0, 1))
    return jstep, variables["params"], opt_state, x, y, jax.random.PRNGKey(1)


def time_train(jstep, args, steps):
    params, opt_state, *rest = args
    params, opt_state, loss = jstep(params, opt_state, *rest)
    float(loss)
    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = jstep(params, opt_state, *rest)
    float(loss)
    return (time.time() - t0) / steps * 1e3


def main():
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))
    assert jax.default_backend() != "cpu"

    # ---- 1. fwd steady state, UNet3D 32 b2 ----
    from mdeical_image_segmentation_tpu.models import get_model

    model = get_model({"name": "UNet3D", "in_channels": 1, "out_channels": 1,
                       "f_maps": 32, "num_levels": 4, "layer_order": "gcr",
                       "dtype": jnp.bfloat16})
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 128, 128, 1),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], False)
    fwd = jax.jit(lambda v, xx: (jnp.sum(model.apply(v, xx, False)),))
    _ = float(fwd(variables, x)[0])
    for block in range(4):
        t0 = time.time()
        acc = 0.0
        for _ in range(25):
            acc = acc + fwd(variables, x)[0]
        float(acc)
        log(f"fwd_f32_b2_block{block}_ms",
            round((time.time() - t0) / 25 * 1e3, 2))
    del model, fwd, variables, x

    # ---- 2. f64 b2 train: depth2d vs native pool, one process ----
    for mode in ("depth2d", "native", "depth2d"):
        os.environ["TPUSEG_POOL"] = mode
        jax.clear_caches()
        jstep, p, o, x, y, k = build_train(64, 2)
        ms = time_train(jstep, (p, o, x, y, k), steps=12)
        key = f"f64_b2_train_{mode}_ms"
        # second depth2d leg confirms ordering effects
        if key in OUT:
            key += "_rep"
        log(key, round(ms, 2))
        del jstep, p, o, x, y, k
    os.environ.pop("TPUSEG_POOL", None)

    print("DONE", json.dumps(OUT), flush=True)


if __name__ == "__main__":
    main()
