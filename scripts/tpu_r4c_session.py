"""Round-4c TPU session: complete the 3D family table under the depth2d
pooling default (PERF.md rows still marked "pre-depth2d"), and re-check the
int8 f64 b1 NEGATIVE now that the pool boundary keeps 2D layouts (the
profiled cost there was (4,1)-layout relayouts at GN/pool boundaries —
scripts/tpu_int8_profile.py).

One long-lived process, value-synced timing (CLAUDE.md measurement
hygiene).  Writes /tmp/tpu_r4c.json.
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
    with open("/tmp/tpu_r4c.json", "w") as f:
        json.dump(OUT, f, indent=2)


def build3d(f_maps=32, batch=2, patch=(64, 128, 128), model_name="UNet3D",
            num_levels=4):
    from mdeical_image_segmentation_tpu.losses import BCEDiceLoss
    from mdeical_image_segmentation_tpu.models import get_model

    model = get_model(
        {"name": model_name, "in_channels": 1, "out_channels": 1,
         "f_maps": f_maps, "num_levels": num_levels, "layer_order": "gcr",
         "dtype": jnp.bfloat16}
    )
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

    jstep = jax.jit(step, donate_argnums=(0, 1))
    return jstep, variables["params"], opt_state, x, y, jax.random.PRNGKey(1)


def time_train(jstep, args, steps=20):
    params, opt_state, *rest = args
    params, opt_state, loss = jstep(params, opt_state, *rest)
    float(loss)
    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = jstep(params, opt_state, *rest)
    float(loss)
    return (time.time() - t0) / steps * 1e3


def time_fwd(fn, *args, steps=30):
    _ = float(fn(*args)[0])
    t0 = time.time()
    acc = 0.0
    for _ in range(steps):
        acc = acc + fn(*args)[0]
    float(acc)
    return (time.time() - t0) / steps * 1e3


def main():
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))
    assert jax.default_backend() != "cpu"

    # ---- pre-depth2d table rows, re-measured under the new default ----
    rows = [
        ("unet3d_f32_b2_5lvl", dict(f_maps=32, batch=2, num_levels=5), 20),
        ("unet3d_f32_b4", dict(f_maps=32, batch=4), 12),
        ("unet3d_f64_b2", dict(f_maps=64, batch=2), 12),
        ("resunetse3d_f32_b2", dict(f_maps=32, batch=2, num_levels=5,
                                    model_name="ResidualUNetSE3D"), 20),
        ("resunet3d_f64_b1", dict(f_maps=64, batch=1, num_levels=5,
                                  model_name="ResidualUNet3D"), 20),
    ]
    for name, kw, steps in rows:
        jstep, p, o, x, y, k = build3d(**kw)
        ms = time_train(jstep, (p, o, x, y, k), steps=steps)
        log(f"{name}_train_ms", round(ms, 2))
        del jstep, p, o, x, y, k

    # ---- inference fwd, UNet3D 32 b2 (row was 55.8 pre-depth2d) ----
    from mdeical_image_segmentation_tpu.models import get_model

    model = get_model({"name": "UNet3D", "in_channels": 1, "out_channels": 1,
                       "f_maps": 32, "num_levels": 4, "layer_order": "gcr",
                       "dtype": jnp.bfloat16})
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 128, 128, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], False)
    fwd = jax.jit(lambda v, xx: (jnp.sum(model.apply(v, xx, False)),))
    log("unet3d_f32_b2_fwd_ms", round(time_fwd(fwd, variables, x), 2))
    del model, fwd, variables, x

    # ---- mirror-TTA forward cost (8-pass ensemble vs single pass) ----
    from itertools import combinations

    model = get_model({"name": "UNet3D", "in_channels": 1, "out_channels": 1,
                       "f_maps": 32, "num_levels": 4, "layer_order": "gcr",
                       "dtype": jnp.bfloat16})
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 128, 128, 1),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], False)
    combos = [list(c) for r in range(4) for c in combinations((1, 2, 3), r)]

    def tta_fwd(v, xx):
        acc = None
        for c in combos:
            xa = jnp.flip(xx, axis=c) if c else xx
            o = model.apply(v, xa, False)
            o = jnp.flip(o, axis=c) if c else o
            acc = o if acc is None else acc + o
        return (jnp.sum(acc / len(combos)),)

    log("tta8_f32_b2_fwd_ms", round(
        time_fwd(jax.jit(tta_fwd), variables, x, steps=10), 2))
    del model, variables, x

    # ---- int8 f64 b1 forward: was 0.76x NEGATIVE pre-depth2d ----
    from mdeical_image_segmentation_tpu.ops import quant

    model = get_model({"name": "UNet3D", "in_channels": 1, "out_channels": 1,
                       "f_maps": 64, "num_levels": 4, "layer_order": "gcr",
                       "dtype": jnp.bfloat16})
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 128, 128, 1),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], False)

    def apply_fn(v, xx, **kw):
        return model.apply(v, xx, False, **kw)

    def pair(v, xx):
        out = model.apply(v, xx, False)
        return jnp.sum(out), out

    fwd_f = jax.jit(pair)
    log("int8chk_f64_b1_float_ms", round(time_fwd(fwd_f, variables, x), 2))
    scales = quant.calibrate(apply_fn, variables, [(x,)])
    fwd_q = jax.jit(quant.wrap_apply(pair, "int8"))
    vq = {**variables, **scales}
    log("int8chk_f64_b1_int8_ms", round(time_fwd(fwd_q, vq, x), 2))
    log("int8chk_f64_b1_speedup", round(
        OUT["int8chk_f64_b1_float_ms"] / OUT["int8chk_f64_b1_int8_ms"], 2))

    print("DONE", json.dumps(OUT)[:800], flush=True)


if __name__ == "__main__":
    main()
