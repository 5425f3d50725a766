"""3D perf pass: profile the UNet3D 'gcr' train step with the corrected
serialized-line attribution, publish a roofline, and rank the real costs.

Round-1 measured 6.9 patches/s (f_maps=32, 64x128x128, b2) with no profile
(VERDICT weak #4).  This session: compile → HLO fusion classification →
steady-state timing → serialized trace breakdown → per-category ms and
roofline math, plus a GroupNorm share estimate (the planned Pallas fusion
target).  Writes /tmp/tpu_3d_profile.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from _tpu_prof_util import categorize, hlo_fusion_classifier, serialized_op_times

OUT = {}


def log(k, v):
    OUT[k] = v
    print(json.dumps({k: v})[:2500], flush=True)
    with open("/tmp/tpu_3d_profile.json", "w") as f:
        json.dump(OUT, f, indent=2)


def build(f_maps=32, batch=2, patch=(64, 128, 128), layer_order="gcr"):
    from mdeical_image_segmentation_tpu.losses import BCEDiceLoss
    from mdeical_image_segmentation_tpu.models import get_model

    model = get_model(
        {"name": "UNet3D", "in_channels": 1, "out_channels": 1,
         "f_maps": f_maps, "num_levels": 4, "layer_order": layer_order,
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


def time_steps(jstep, params, opt_state, x, y, key, steps=20):
    params, opt_state, loss = jstep(params, opt_state, x, y, key)
    float(loss)
    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = jstep(params, opt_state, x, y, key)
    float(loss)
    return (time.time() - t0) / steps * 1e3, params, opt_state


def main():
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))

    cfg = dict(f_maps=32, batch=2, patch=(64, 128, 128))
    jstep, params, opt_state, x, y, key = build(**cfg)

    t0 = time.time()
    compiled = jstep.lower(params, opt_state, x, y, key).compile()
    log("compile_s", round(time.time() - t0, 1))
    txt = compiled.as_text()
    with open("/tmp/tpu_3d_hlo.txt", "w") as f:
        f.write(txt)
    classify = hlo_fusion_classifier(txt)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        log("cost_analysis_gflop", round(ca.get("flops", 0) / 1e9, 1))
        log("cost_analysis_hbm_gb",
            round(ca.get("bytes accessed", 0) / 1e9, 2))
    except Exception as e:
        log("cost_analysis", str(e)[:200])

    ms, params, opt_state = time_steps(jstep, params, opt_state, x, y, key)
    log("ms_per_step", round(ms, 2))
    log("patches_per_sec", round(cfg["batch"] / ms * 1e3, 2))

    # fresh dir per run: serialized_op_times globs every trace under the
    # dir, so a reused path silently mixes in stale runs
    import shutil
    import tempfile

    logdir = tempfile.mkdtemp(prefix="prof_3d_")
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        params, opt_state, loss = jstep(params, opt_state, x, y, key)
    float(loss)
    jax.profiler.stop_trace()

    op_time, total = serialized_op_times(logdir)
    shutil.rmtree(logdir, ignore_errors=True)  # traces parsed; don't pile up
    cats = categorize(op_time, classify)
    log("serialized_ms_per_step", round(total / 5, 2))
    log("breakdown_ms_per_step",
        {c: round(t / 5, 2) for c, t in
         sorted(cats.items(), key=lambda kv: -kv[1])})
    top = sorted(op_time.items(), key=lambda kv: -kv[1])[:25]
    log("top_ops_ms_per_step",
        [(n[:110], round(t / 5, 3)) for n, t in top])

    # GroupNorm share: elementwise fusions containing rsqrt/divide over the
    # group-stat path — estimate via ops whose name carries 'reduce' +
    # elementwise category (upper bound: all non-conv, non-pool time)
    non_conv = total - cats.get("conv", 0.0) - cats.get("pooling", 0.0)
    log("non_conv_non_pool_ms_per_step", round(non_conv / 5, 2))

    # secondary configs for the table
    for name, kw in [
        ("fmaps64_b1", dict(f_maps=64, batch=1, patch=(64, 128, 128))),
        ("fmaps32_b4_32z", dict(f_maps=32, batch=4, patch=(32, 128, 128))),
    ]:
        jstep2, p2, o2, x2, y2, k2 = build(**kw)
        ms2, _, _ = time_steps(jstep2, p2, o2, x2, y2, k2)
        log(f"{name}_ms_per_step", round(ms2, 2))
        log(f"{name}_patches_per_sec", round(kw["batch"] / ms2 * 1e3, 2))

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
