"""Round-3c TPU session: A/B the pairwise maxpool (TPUSEG_POOL) and the
layout-aware slab-conv custom VJP (TPUSEG_SLAB_VJP) on the UNet3D 'gcr'
train step, then profile the winning combination.

Targets from the fresh 95.2 ms profile (PERF.md): select_and_scatter
3.8 ms + its output copy, and the per-tap saved-slab relayout copies
(~8 × 1.25 ms at the big decoder levels).  Writes /tmp/tpu_r3c.json.
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

OUT = {}


def log(k, v):
    OUT[k] = v
    print(json.dumps({k: v})[:2000], flush=True)
    with open("/tmp/tpu_r3c.json", "w") as f:
        json.dump(OUT, f, indent=2)


def fresh_modules():
    """Env knobs are read at trace time; clear the custom-vjp cache so a
    mode change can't serve a stale closure."""
    from mdeical_image_segmentation_tpu.ops import conv3d

    conv3d._slab_custom_fn.cache_clear()


def build3d(f_maps=32, batch=2, patch=(64, 128, 128), model_name="UNet3D"):
    from mdeical_image_segmentation_tpu.losses import BCEDiceLoss
    from mdeical_image_segmentation_tpu.models import get_model

    model = get_model(
        {"name": model_name, "in_channels": 1, "out_channels": 1,
         "f_maps": f_maps, "num_levels": 4, "layer_order": "gcr",
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


def build2d(base=64, batch=32, res=256):
    from mdeical_image_segmentation_tpu.losses.losses2d import HybridSegLoss
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel

    cfg = UNetConfig(in_channels=1, n_classes=1, base_channels=base,
                     dtype="bfloat16")
    model = UNetModel(cfg)
    crit = HybridSegLoss()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, res, res, 1), jnp.float32)
    y = (x > 0.5).astype(jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    opt = optax.adamw(1e-4)
    opt_state = opt.init(variables["params"])

    def step(params, opt_state, x, y):
        def loss_fn(p):
            out = model.apply({"params": p}, x)
            return crit(out, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    return jstep, variables["params"], opt_state, x, y


def time3d(jstep, params, opt_state, x, y, key, steps=20):
    params, opt_state, loss = jstep(params, opt_state, x, y, key)
    float(loss)
    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = jstep(params, opt_state, x, y, key)
    float(loss)
    return (time.time() - t0) / steps * 1e3


def time2d(jstep, params, opt_state, x, y, steps=20):
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

    # --- A/B matrix on UNet3D f32 b2 ---
    for pool in ("native", "pairwise"):
        for vjp in ("autodiff", "custom"):
            os.environ["TPUSEG_POOL"] = pool
            os.environ["TPUSEG_SLAB_VJP"] = vjp
            fresh_modules()
            jstep, p, o, x, y, k = build3d()
            ms = time3d(jstep, p, o, x, y, k)
            log(f"f32_b2_pool-{pool}_vjp-{vjp}_ms", round(ms, 2))
            del jstep, p, o, x, y, k

    # --- pick winner, extras ---
    best = min(
        (v, k) for k, v in OUT.items() if k.startswith("f32_b2_pool")
    )[1]
    pool = "pairwise" if "pairwise" in best else "native"
    vjp = "custom" if "custom" in best else "autodiff"
    log("winner", {"pool": pool, "vjp": vjp})
    os.environ["TPUSEG_POOL"] = pool
    os.environ["TPUSEG_SLAB_VJP"] = vjp
    fresh_modules()

    jstep, p, o, x, y, k = build3d(f_maps=64, batch=1)
    log("f64_b1_winner_ms", round(time3d(jstep, p, o, x, y, k), 2))
    del jstep, p, o, x, y, k

    jstep, p, o, x, y, k = build3d(model_name="ResidualUNet3D")
    log("resid32_b2_winner_ms", round(time3d(jstep, p, o, x, y, k), 2))
    del jstep, p, o, x, y, k

    # --- 2D: pairwise pool A/B at base64 b32 ---
    for pool in ("native", "pairwise"):
        os.environ["TPUSEG_POOL"] = pool
        jstep, p, o, x, y = build2d()
        log(f"unet2d_base64_b32_pool-{pool}_ms", round(time2d(jstep, p, o, x, y), 2))
        del jstep, p, o, x, y

    # --- profile the winning 3D step ---
    os.environ["TPUSEG_POOL"] = "pairwise" if "pairwise" in best else "native"
    from _tpu_prof_util import categorize, hlo_fusion_classifier, serialized_op_times

    fresh_modules()
    jstep, p, o, x, y, k = build3d()
    compiled = jstep.lower(p, o, x, y, k).compile()
    txt = compiled.as_text()
    with open("/tmp/tpu_r3c_hlo.txt", "w") as f:
        f.write(txt)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        log("winner_hbm_gb", round(ca.get("bytes accessed", 0) / 1e9, 2))
    except Exception as e:
        log("cost_analysis", str(e)[:200])
    classify = hlo_fusion_classifier(txt)

    import shutil
    import tempfile

    p, o, loss = jstep(p, o, x, y, k)
    float(loss)
    logdir = tempfile.mkdtemp(prefix="prof_r3c_")
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        p, o, loss = jstep(p, o, x, y, k)
    float(loss)
    jax.profiler.stop_trace()
    op_time, total = serialized_op_times(logdir)
    shutil.rmtree(logdir, ignore_errors=True)
    cats = categorize(op_time, classify)
    log("winner_serialized_ms", round(total / 5, 2))
    log("winner_breakdown_ms",
        {c: round(t / 5, 2) for c, t in
         sorted(cats.items(), key=lambda kv: -kv[1])})
    top = sorted(op_time.items(), key=lambda kv: -kv[1])[:20]
    log("winner_top_ops_ms", [(n[:110], round(t / 5, 3)) for n, t in top])

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
