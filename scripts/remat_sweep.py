"""Measure classic-UNet remat=True vs False on the real chip (width curve).

At narrow widths the train step is HBM-bandwidth-bound (PERF.md: base8
b256 moves 27.6 GB/step at 79% of roofline with the MXU ~93% idle), so
rematerializing the DoubleConv pairs trades idle FLOPs for stashed
activation traffic.  This script quantifies that trade at base8/16/64.

Run from /root/repo: python scripts/remat_sweep.py
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

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def bench(base_features, batch, remat, steps=40, res=256):
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel

    model = UNetModel(
        UNetConfig(
            in_channels=1, out_channels=1, unet_type="UNet",
            base_features=base_features, compute_dtype="bfloat16",
            remat=remat,
        )
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
    params, opt_state, loss = jstep(params, opt_state, x, y)
    float(loss)  # double warmup (tunnel first-fetch contamination, PERF.md)
    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = jstep(params, opt_state, x, y)
    final = float(loss)
    dt = time.time() - t0
    return {
        "slices_per_sec": round(steps * batch / dt, 1),
        "ms_per_step": round(dt / steps * 1e3, 2),
        "final_loss": round(final, 4),
    }


def main():
    _ = float(jnp.zeros((8, 8)).sum())  # chip-claim barrier
    print("device:", jax.devices()[0], flush=True)
    for bf, batch in ((8, 256), (16, 128), (64, 32)):
        for remat in (False, True):
            r = bench(bf, batch, remat)
            print(json.dumps({"base": bf, "batch": batch, "remat": remat, **r}),
                  flush=True)


if __name__ == "__main__":
    main()
