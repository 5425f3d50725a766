"""Round-4 TPU session: (a) A/B the depth2d maxpool decomposition
(TPUSEG_POOL=depth2d: 2D reduce_window + leading-axis depth select — the
untried variant after 'pairwise' lost to its W-axis reshape), (b) sweep
per-compile XLA compiler options (scoped-VMEM limit, latency-hiding
scheduler) on the 3D and 2D train steps, (c) profile the 2D base8 step
(the north-star width whose 42 ms was never broken down).

Writes /tmp/tpu_r4.json.
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
    with open("/tmp/tpu_r4.json", "w") as f:
        json.dump(OUT, f, indent=2)


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
    """Same step as bench.py's bench_unet2d (wrapper-internal loss: BCE for
    the classic UNet — the published slices/s numbers), so profiles here
    attribute the same program."""
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel

    model = UNetModel(
        UNetConfig(
            in_channels=1, out_channels=1, unet_type="UNet",
            base_features=base, compute_dtype="bfloat16",
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
            out = model.apply({"params": p}, x, y, train=True)
            return out.loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    return jstep, variables["params"], opt_state, x, y


def time_compiled(cstep, args, steps=20, has_key=False):
    """Steady-state ms/step of an already-compiled step (value-synced)."""
    params, opt_state, *rest = args
    params, opt_state, loss = cstep(params, opt_state, *rest)
    float(loss)
    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = cstep(params, opt_state, *rest)
    float(loss)
    return (time.time() - t0) / steps * 1e3


def compile_with(jstep, args, options=None):
    lowered = jstep.lower(*args)
    if options:
        return lowered.compile(compiler_options=options)
    return lowered.compile()


def main():
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))

    # ---------- (a) depth2d pool A/B, 3D f32 b2 then f64 b1 ----------
    for pool in ("native", "depth2d"):
        os.environ["TPUSEG_POOL"] = pool
        jstep, p, o, x, y, k = build3d()
        ms = time_compiled(jstep, (p, o, x, y, k))
        log(f"3d_f32_b2_pool-{pool}_ms", round(ms, 2))
        del jstep, p, o, x, y, k
    for pool in ("native", "depth2d"):
        os.environ["TPUSEG_POOL"] = pool
        jstep, p, o, x, y, k = build3d(f_maps=64, batch=1)
        ms = time_compiled(jstep, (p, o, x, y, k), steps=15)
        log(f"3d_f64_b1_pool-{pool}_ms", round(ms, 2))
        del jstep, p, o, x, y, k
    os.environ["TPUSEG_POOL"] = "auto"

    # ---------- (b) XLA compiler-option sweep ----------
    # Per-compile options (not process-global XLA_FLAGS) so one session can
    # A/B them.  Each is tried independently; failures (option rejected by
    # the compile service) are logged and skipped.
    option_sets = {
        "vmem32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
        "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
        "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
        "flm_opt": {"xla_tpu_enable_flm_cost_model": "true"},
    }
    for tag, build, args_steps in (
        ("3d_f32_b2", build3d, dict()),
        ("2d_base64_b32", build2d, dict()),
    ):
        built = build()
        jstep, rest = built[0], built[1:]
        base = compile_with(jstep, rest)
        ms = time_compiled(base, rest)
        log(f"{tag}_opts-none_ms", round(ms, 2))
        for name, opts in option_sets.items():
            try:
                c = compile_with(jstep, rest, opts)
                ms = time_compiled(c, rest)
                log(f"{tag}_opts-{name}_ms", round(ms, 2))
                del c
            except Exception as e:
                log(f"{tag}_opts-{name}_error", f"{type(e).__name__}: {e}"[:300])
        del jstep, rest, base, built

    # ---------- (c) 2D base8 b256 profile ----------
    from _tpu_prof_util import (categorize, hlo_fusion_classifier,
                                serialized_op_times)

    built = build2d(base=8, batch=256)
    jstep, rest = built[0], built[1:]
    compiled = compile_with(jstep, rest)
    txt = compiled.as_text()
    with open("/tmp/tpu_r4_base8_hlo.txt", "w") as f:
        f.write(txt)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        log("base8_gflop", round(ca.get("flops", 0) / 1e9, 1))
        log("base8_hbm_gb", round(ca.get("bytes accessed", 0) / 1e9, 2))
    except Exception as e:
        log("base8_cost_analysis", str(e)[:200])
    classify = hlo_fusion_classifier(txt)

    ms = time_compiled(compiled, rest)
    log("base8_b256_ms", round(ms, 2))
    log("base8_slices_per_sec", round(256 / ms * 1e3, 1))

    import shutil
    import tempfile

    p, o, x, y = rest
    p, o, loss = compiled(p, o, x, y)
    float(loss)
    logdir = tempfile.mkdtemp(prefix="prof_r4_")
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        p, o, loss = compiled(p, o, x, y)
    float(loss)
    jax.profiler.stop_trace()
    op_time, total = serialized_op_times(logdir)
    shutil.rmtree(logdir, ignore_errors=True)
    cats = categorize(op_time, classify)
    log("base8_serialized_ms", round(total / 5, 2))
    log("base8_breakdown_ms",
        {c: round(t / 5, 2) for c, t in
         sorted(cats.items(), key=lambda kv: -kv[1])})
    top = sorted(op_time.items(), key=lambda kv: -kv[1])[:20]
    log("base8_top_ops_ms", [(n[:110], round(t / 5, 3)) for n, t in top])

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
