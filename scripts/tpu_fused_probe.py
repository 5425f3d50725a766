"""Compile-probe the fused Pallas kernels on the real TPU, one config at a
time, printing full errors — the cheap iteration loop for Mosaic issues."""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mdeical_image_segmentation_tpu.ops import fused_conv

t0 = time.time()
_ = float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
print(f"claim {time.time() - t0:.0f}s device={jax.devices()[0]}", flush=True)


def probe(name, fn):
    t0 = time.time()
    try:
        out = fn()
        vals = [float(jnp.sum(o.astype(jnp.float32))) for o in
                (out if isinstance(out, (tuple, list)) else [out])]
        print(f"OK   {name}: {time.time() - t0:.1f}s sums={vals}", flush=True)
    except Exception:
        print(f"FAIL {name}: {time.time() - t0:.1f}s", flush=True)
        tb = traceback.format_exc()
        # keep the mosaic op + message lines
        for line in tb.splitlines():
            if any(k in line for k in ("Error", "error", "tpu.", "Mosaic",
                                       "not supported", "Unimplemented",
                                       "INTERNAL", "layout")):
                print("   ", line[:300], flush=True)


def rnd(shape, seed=0, dtype=jnp.bfloat16):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), dtype)


def dc(n, h, w, ci, c1, co, im2col=True):
    x = rnd((n, h, w, ci))
    w1 = rnd((3, 3, ci, c1), 1) * 0.1
    b1 = jnp.zeros((c1,), jnp.bfloat16)
    w2 = rnd((3, 3, c1, co), 2) * 0.1
    b2 = jnp.zeros((co,), jnp.bfloat16)
    return lambda: fused_conv.fused_double2d(x, w1, b1, w2, b2,
                                             im2col=im2col)


def g3(n, d, h, w, ci, co, im2col=True):
    x = rnd((n, d, h, w, ci))
    wk = rnd((3, 3, 3, ci, co), 1) * 0.1
    a = jnp.ones((n, ci), jnp.float32)
    b = jnp.zeros((n, ci), jnp.float32)
    return lambda: fused_conv.fused_conv3d(x, wk, a, b, im2col=im2col)


which = os.environ.get("PROBE", "all")
if which in ("all", "dc"):
    probe("dc_tiny_ci1", dc(1, 32, 32, 1, 8, 8))
    probe("dc_ci8", dc(1, 64, 64, 8, 8, 8))
    probe("dc_ci8_taps", dc(1, 64, 64, 8, 8, 8, im2col=False))
    probe("dc_ci16", dc(1, 128, 128, 16, 16, 16))
    probe("dc_base8_l1", dc(4, 256, 256, 1, 8, 8))
    probe("dc_base8_l2", dc(4, 128, 128, 8, 16, 16))
if which in ("all", "g3"):
    probe("g3_ci8", g3(1, 4, 32, 32, 8, 8))
    probe("g3_ci8_taps", g3(1, 4, 32, 32, 8, 8, im2col=False))
    probe("g3_l1_w32", g3(1, 8, 128, 128, 32, 64))
    probe("g3_l2_w64", g3(1, 8, 64, 64, 64, 128))
print("done", flush=True)
