"""Probe: does XLA emit fast int8 convs/dots on this TPU (v5e)?

v5e's MXU runs int8 at 2x the bf16 peak (394 -> 788 TOPS), which would
make a post-training-quantized inference path worthwhile.  But that only
holds if XLA lowers s8xs8->s32 convolutions onto the int8 MXU path rather
than upcasting.  This probe times the dominant conv shapes of the 2D UNet
(base64) and the slab-form 3D UNet in bf16 vs int8 before any framework
integration is built.  Writes /tmp/tpu_int8.json.

Timing: lax.scan chains N conv applications on a carry so one
block_until_ready syncs the whole chain (async-dispatch safe through the
tunnel, same methodology as bench.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

OUT = {}


def log(k, v):
    OUT[k] = v
    print(json.dumps({k: v})[:2000], flush=True)
    with open("/tmp/tpu_int8.json", "w") as f:
        json.dump(OUT, f, indent=2)


DIMNUMS = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def time_conv(name, shape, kshape, dtype, steps=30):
    """Time `steps` chained 3x3 SAME convs on a carry of `shape`."""
    rng = np.random.RandomState(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.randint(-127, 128, shape), jnp.int8)
        w = jnp.asarray(rng.randint(-127, 128, kshape), jnp.int8)
        acc = jnp.int32
    else:
        x = jnp.asarray(rng.rand(*shape) - 0.5, dtype)
        w = jnp.asarray(rng.rand(*kshape) - 0.5, dtype)
        acc = jnp.float32

    def body(c, _):
        y = lax.conv_general_dilated(
            c, w, (1, 1), "SAME", dimension_numbers=DIMNUMS,
            preferred_element_type=acc)
        # cheap renormalizing cast back to the carry dtype
        if dtype == jnp.int8:
            c2 = (y >> 12).astype(jnp.int8)
        else:
            c2 = (y * 0.01).astype(dtype)
        return c2, ()

    @jax.jit
    def run(x):
        c, _ = lax.scan(body, x, None, length=steps)
        return c

    lowered = jax.jit(run).lower(x)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    conv_lines = [l.strip()[:160] for l in hlo.splitlines() if "convolution" in l and "=" in l]
    r = run(x)
    r.block_until_ready()
    t0 = time.time()
    r = run(x)
    r.block_until_ready()
    dt = (time.time() - t0) / steps
    # FLOPs: 2 * N*H*W * kh*kw*Ci * Co  (MACs x2; int8 "OPS")
    n, h, w_, ci = shape
    kh, kw, _, co = kshape
    flops = 2 * n * h * w_ * kh * kw * ci * co
    log(name, {"ms": round(dt * 1e3, 3), "tops": round(flops / dt / 1e12, 1),
               "conv_hlo": conv_lines[:2]})
    return dt


def time_dot(name, m, k, n, dtype, steps=50):
    rng = np.random.RandomState(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
        b = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)
        acc = jnp.int32
    else:
        a = jnp.asarray(rng.rand(m, k) - 0.5, dtype)
        b = jnp.asarray(rng.rand(k, n) - 0.5, dtype)
        acc = jnp.float32

    def body(c, _):
        y = lax.dot(c, b, preferred_element_type=acc)
        if dtype == jnp.int8:
            c2 = (y >> 12).astype(jnp.int8)
        else:
            c2 = (y * 0.01).astype(dtype)
        return c2, ()

    @jax.jit
    def run(a):
        c, _ = lax.scan(body, a, None, length=steps)
        return c

    r = run(a)
    r.block_until_ready()
    t0 = time.time()
    r = run(a)
    r.block_until_ready()
    dt = (time.time() - t0) / steps
    flops = 2 * m * k * n
    log(name, {"ms": round(dt * 1e3, 3), "tops": round(flops / dt / 1e12, 1)})


def main():
    log("devices", str(jax.devices()))
    t0 = time.time()
    jnp.zeros((8, 128)).block_until_ready()
    log("claim_s", round(time.time() - t0, 1))

    # MXU sanity: big square matmul
    time_dot("dot_4096_bf16", 4096, 4096, 4096, jnp.bfloat16)
    time_dot("dot_4096_int8", 4096, 4096, 4096, jnp.int8)

    # 2D UNet level-1 conv (the FLOP-dominant shape at base64, batch 32)
    time_conv("conv2d_l1_bf16", (32, 256, 256, 64), (3, 3, 64, 64), jnp.bfloat16)
    time_conv("conv2d_l1_int8", (32, 256, 256, 64), (3, 3, 64, 64), jnp.int8)

    # deeper 2D level: 128x128x128ch
    time_conv("conv2d_l2_bf16", (32, 128, 128, 128), (3, 3, 128, 128), jnp.bfloat16)
    time_conv("conv2d_l2_int8", (32, 128, 128, 128), (3, 3, 128, 128), jnp.int8)

    # slab-form 3D level-1 conv (N*D=128 folded batch, f_maps=32)
    time_conv("conv_slab_l1_bf16", (128, 128, 128, 32), (3, 3, 32, 32), jnp.bfloat16)
    time_conv("conv_slab_l1_int8", (128, 128, 128, 32), (3, 3, 32, 32), jnp.int8)

    # slab-form 3D at reference width f_maps=64
    time_conv("conv_slab_f64_bf16", (64, 128, 128, 64), (3, 3, 64, 64), jnp.bfloat16)
    time_conv("conv_slab_f64_int8", (64, 128, 128, 64), (3, 3, 64, 64), jnp.int8)

    print("DONE", json.dumps(OUT)[:400])


if __name__ == "__main__":
    main()
