"""GroupNorm-cost experiments on the UNet3D 'gcr' train step.

The r2b/r2d profiles put the 'gcr' step at ~290 ms with the time split
roughly evenly between convs, elementwise passes, and layout copies — and
swapping flax's GroupNorm for the first custom-VJP cut moved nothing.
This session isolates the norm's true cost and measures the x̂-residual
rewrite (ops/norm.py): per config, steady-state ms/step and XLA's own
HBM-byte estimate.

Configs: 'gcr' (new GroupNorm) and 'cr' (no norm — the lower bound that
prices the whole norm).  Writes /tmp/tpu_gn_session.json.
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
    with open("/tmp/tpu_gn_session.json", "w") as f:
        json.dump(OUT, f, indent=2)


def build(layer_order, f_maps=32, batch=2, patch=(64, 128, 128), remat=False):
    from mdeical_image_segmentation_tpu.losses import BCEDiceLoss
    from mdeical_image_segmentation_tpu.models import get_model

    model = get_model(
        {"name": "UNet3D", "in_channels": 1, "out_channels": 1,
         "f_maps": f_maps, "num_levels": 4, "layer_order": layer_order,
         "dtype": jnp.bfloat16, "remat": remat}
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


def time_config(name, layer_order, **bkw):
    jstep, params, opt_state, x, y, key = build(layer_order, **bkw)
    t0 = time.time()
    compiled = jstep.lower(params, opt_state, x, y, key).compile()
    log(f"{name}_compile_s", round(time.time() - t0, 1))
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        log(f"{name}_hbm_gb", round(ca.get("bytes accessed", 0) / 1e9, 2))
    except Exception as e:
        log(f"{name}_cost", str(e)[:120])
    params, opt_state, loss = jstep(params, opt_state, x, y, key)
    float(loss)
    t0 = time.time()
    for _ in range(15):
        params, opt_state, loss = jstep(params, opt_state, x, y, key)
    float(loss)
    ms = (time.time() - t0) / 15 * 1e3
    log(f"{name}_ms_per_step", round(ms, 2))
    log(f"{name}_patches_per_sec", round(2 / ms * 1e3, 2))


def main():
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))

    if os.environ.get("REF_PATCH"):
        # the reference's 3D config of record: FilterSliceBuilder patch
        # [80, 170, 170], f_maps=64, batch 1 (reference resources/*.yml)
        for name, kw in [
            ("refpatch_w64b1", dict(f_maps=64, batch=1, patch=(80, 170, 170))),
            ("refpatch_w64b1_remat",
             dict(f_maps=64, batch=1, patch=(80, 170, 170), remat=True)),
        ]:
            try:
                time_config(name, "gcr", **kw)
            except Exception as e:
                log(f"{name}_error", f"{type(e).__name__}: {e}"[:300])
    elif os.environ.get("SLAB_BATCH"):
        # batch scaling of the slab+hybrid step (HBM-capacity permitting)
        time_config("gcr_slab_b4", "gcr", batch=4)
        time_config("gcr_slab_b8", "gcr", batch=8)
        time_config("gcr_slab_w64b2", "gcr", f_maps=64, batch=2)
    elif os.environ.get("CONV_SLAB"):
        # slab-decomposed 3D convs (ops/conv3d.py) + hybrid GN, vs the
        # native-conv 238.9 ms baseline from the GN_MODES run
        time_config("gcr_slab", "gcr")
        time_config("cr_slab_nonorm", "cr")
        time_config("gcr_slab_w64b1", "gcr", f_maps=64, batch=1)
        os.environ["TPUSEG_CONV3D"] = "native"
        time_config("gcr_native_w64b1", "gcr", f_maps=64, batch=1)
    elif os.environ.get("GN_MODES"):
        # three-way mode shoot-out: full pallas vs hybrid vs pure XLA
        os.environ["TPUSEG_GN_MODE"] = "hybrid"
        time_config("gcr_hybrid", "gcr")
        os.environ["TPUSEG_GN_MODE"] = "full"
        time_config("gcr_full", "gcr")
        os.environ["TPUSEG_NO_PALLAS_GN"] = "1"
        time_config("gcr_xla", "gcr")
    elif os.environ.get("GN_PALLAS_ONLY"):
        time_config("gcr_pallas", "gcr")  # dispatches to the Pallas kernels
        os.environ["TPUSEG_NO_PALLAS_GN"] = "1"
        time_config("gcr_xla", "gcr")
    else:
        time_config("gcr_newgn", "gcr")
        time_config("cr_nonorm", "cr")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
