"""Profile the int8 UNet3D f64 b1 forward to explain its regression.

The raw slab-conv probe at the exact f64 shape shows int8 1.73x faster
than bf16 (scripts/tpu_int8_probe.py), yet the full f64 b1 model forward
measured SLOWER quantized (54.7 vs 41.8 ms — scripts/tpu_int8_e2e.py).
This attributes the serialized device time of both forwards by HLO
category (conv / copy / elementwise) to find the eater.  Writes
/tmp/tpu_int8_profile.json.
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

from _tpu_prof_util import categorize, hlo_fusion_classifier, serialized_op_times

OUT = {}


def log(k, v):
    OUT[k] = v
    print(json.dumps({k: v})[:2000], flush=True)
    with open("/tmp/tpu_int8_profile.json", "w") as f:
        json.dump(OUT, f, indent=2)


def profile(name, fwd, variables, x, steps=20):
    _ = float(fwd(variables, x))
    t0 = time.time()
    acc = 0.0
    for _ in range(steps):
        acc = acc + fwd(variables, x)
    float(acc)
    ms = (time.time() - t0) / steps * 1e3
    log(f"{name}_ms", round(ms, 2))

    hlo = jax.jit(fwd).lower(variables, x).compile().as_text()
    classify = hlo_fusion_classifier(hlo)
    logdir = f"/tmp/int8prof_{name}"
    with jax.profiler.trace(logdir):
        acc = 0.0
        for _ in range(5):
            acc = acc + fwd(variables, x)
        float(acc)
    op_time, total = serialized_op_times(logdir)
    cats = categorize(op_time, classify)
    log(f"{name}_cats_ms", {k: round(v / 5, 2) for k, v in
                            sorted(cats.items(), key=lambda kv: -kv[1])})
    top = sorted(op_time.items(), key=lambda kv: -kv[1])[:12]
    log(f"{name}_top_ops", [[n[:70], round(t / 5, 2)] for n, t in top])


def main():
    from mdeical_image_segmentation_tpu.models import get_model
    from mdeical_image_segmentation_tpu.ops import quant

    log("devices", str(jax.devices()))
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))

    model = get_model(
        {"name": "UNet3D", "in_channels": 1, "out_channels": 1,
         "f_maps": 64, "num_levels": 4, "layer_order": "gcr",
         "dtype": jnp.bfloat16})
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 64, 128, 128, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)

    fwd_f = jax.jit(lambda v, xx: jnp.sum(model.apply(v, xx, False)))
    profile("float_f64b1", fwd_f, variables, x)

    scales = quant.calibrate(
        lambda v, xx, **kw: model.apply(v, xx, False, **kw), variables, [(x,)])
    fwd_q = jax.jit(quant.wrap_apply(
        lambda v, xx: jnp.sum(model.apply(v, xx, False)), "int8"))
    profile("int8_f64b1", fwd_q, {**variables, **scales}, x)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
