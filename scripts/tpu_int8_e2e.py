"""End-to-end int8 PTQ forward on TPU: float vs quantized model forwards.

Follows the value-synced timing methodology of scripts/tpu_r3_session.py
(sum-reduced jitted forward, accumulate, one float() fetch for the chain).
For each config: time the bf16 float forward, calibrate activation scales
on one batch (ops/quant.py), time the int8 forward, and record output
fidelity (max rel err + sign-mask agreement) between the two.  Writes
/tmp/tpu_int8_e2e.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = {}


def log(k, v):
    OUT[k] = v
    print(json.dumps({k: v})[:2000], flush=True)
    with open("/tmp/tpu_int8_e2e.json", "w") as f:
        json.dump(OUT, f, indent=2)


def time_fn(fn, *args, steps=30):
    _ = float(fn(*args)[0])
    t0 = time.time()
    acc = 0.0
    for _ in range(steps):
        acc = acc + fn(*args)[0]
    float(acc)
    return (time.time() - t0) / steps * 1e3


def run_3d(name, model_cfg, batch, patch, steps=30):
    from mdeical_image_segmentation_tpu.models import get_model
    from mdeical_image_segmentation_tpu.ops import quant

    model = get_model(dict(model_cfg, dtype=jnp.bfloat16))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, *patch, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], False)

    def apply_fn(v, xx, **kw):
        return model.apply(v, xx, False, **kw)

    fwd_f = jax.jit(lambda v, xx: (jnp.sum(model.apply(v, xx, False)),
                                   model.apply(v, xx, False)))
    ms_f = time_fn(fwd_f, variables, x, steps=steps)
    log(f"{name}_float_ms", round(ms_f, 2))

    scales = quant.calibrate(apply_fn, variables, [(x,)])
    qfn = quant.wrap_apply(
        lambda v, xx: (jnp.sum(model.apply(v, xx, False)),
                       model.apply(v, xx, False)), "int8")
    fwd_q = jax.jit(lambda v, xx: qfn(v, xx))
    vq = {**variables, **scales}
    ms_q = time_fn(fwd_q, vq, x, steps=steps)
    log(f"{name}_int8_ms", round(ms_q, 2))
    log(f"{name}_speedup", round(ms_f / ms_q, 2))

    yf = np.asarray(fwd_f(variables, x)[1], np.float32)
    yq = np.asarray(fwd_q(vq, x)[1], np.float32)
    log(f"{name}_rel_err", round(
        float(np.abs(yf - yq).max() / (np.abs(yf).max() + 1e-9)), 4))
    log(f"{name}_mask_agree", round(float(((yf > 0) == (yq > 0)).mean()), 4))


def run_2d(name, base, batch, res, steps=30):
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel
    from mdeical_image_segmentation_tpu.ops import quant

    model = UNetModel(UNetConfig(
        in_channels=1, out_channels=1, unet_type="UNet",
        base_features=base, compute_dtype="bfloat16"))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, res, res, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    def apply_fn(v, xx, **kw):
        return model.apply(v, xx, None, train=False, **kw)

    def pair(v, xx):
        out = model.apply(v, xx, None, train=False).logits
        return jnp.sum(out), out

    fwd_f = jax.jit(pair)
    ms_f = time_fn(fwd_f, variables, x, steps=steps)
    log(f"{name}_float_ms", round(ms_f, 2))

    scales = quant.calibrate(apply_fn, variables, [(x,)])
    fwd_q = jax.jit(quant.wrap_apply(pair, "int8"))
    vq = {**variables, **scales}
    ms_q = time_fn(fwd_q, vq, x, steps=steps)
    log(f"{name}_int8_ms", round(ms_q, 2))
    log(f"{name}_speedup", round(ms_f / ms_q, 2))

    yf = np.asarray(fwd_f(variables, x)[1], np.float32)
    yq = np.asarray(fwd_q(vq, x)[1], np.float32)
    log(f"{name}_rel_err", round(
        float(np.abs(yf - yq).max() / (np.abs(yf).max() + 1e-9)), 4))
    log(f"{name}_mask_agree", round(float(((yf > 0) == (yq > 0)).mean()), 4))


def main():
    log("devices", str(jax.devices()))
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))

    # matches PERF.md "inference fwd, UNet3D 32, b2" row (55.8 ms float)
    run_3d("unet3d_f32_b2",
           {"name": "UNet3D", "in_channels": 1, "out_channels": 1,
            "f_maps": 32, "num_levels": 4, "layer_order": "gcr"},
           batch=2, patch=(64, 128, 128))
    # reference-width 3D
    run_3d("unet3d_f64_b1",
           {"name": "UNet3D", "in_channels": 1, "out_channels": 1,
            "f_maps": 64, "num_levels": 4, "layer_order": "gcr"},
           batch=1, patch=(64, 128, 128))
    # 2D headline shape
    run_2d("unet2d_b64_b32", base=64, batch=32, res=256)
    print("DONE", json.dumps(OUT)[:600], flush=True)


if __name__ == "__main__":
    main()
