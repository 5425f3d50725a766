"""Is XLA's native 3D convolution the 3D step's bottleneck?

The r2 profile (tpu_3d_profile.json) has the UNet3D 'gcr' step at ~239 ms
with convs at only a few % of MXU peak while the same-width 2D convs run at
27 %+.  Hypothesis: lowering a k=3 depth axis through XLA's 2D-optimized
conv path — y[:, d] = Σ_k conv2d(x[:, d+k-1], W[k]) with (N·D) folded into
the conv batch — recovers 2D-conv efficiency.

Times fwd and fwd+bwd of single convs at representative UNet3D shapes, then
a full conv stack, for: native lax 3D conv vs the slab decomposition.
Writes /tmp/tpu_conv3d.json.
"""

import functools
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
    with open("/tmp/tpu_conv3d.json", "w") as f:
        json.dump(OUT, f, indent=2)


DN3 = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                 ("NDHWC", "DHWIO", "NDHWC"))
DN2 = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NHWC", "HWIO", "NHWC"))


def conv3d_native(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                    dimension_numbers=DN3)


def conv3d_slab(x, w):
    """(N,D,H,W,Ci) ⊛ (3,3,3,Ci,Co) as 3 shifted 2D convs over N·D slabs."""
    n, d, h, ww, ci = x.shape
    kd = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (kd // 2, kd // 2), (0, 0), (0, 0), (0, 0)))
    y = None
    for k in range(kd):
        xs = lax.dynamic_slice_in_dim(xp, k, d, axis=1)
        xs2 = xs.reshape(n * d, h, ww, ci)
        yk = lax.conv_general_dilated(xs2, w[k], (1, 1), "SAME",
                                      dimension_numbers=DN2)
        y = yk if y is None else y + yk
    return y.reshape(n, d, h, ww, -1)


def conv3d_cat(x, w):
    """(N,D,H,W,Ci) ⊛ (3,3,3,Ci,Co) as ONE 2D conv over N·D slabs with the
    kd depth taps concatenated along channels (K = kd·Ci → better MXU
    lane utilization than kd separate K=Ci convs)."""
    n, d, h, ww, ci = x.shape
    kd = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (kd // 2, kd // 2), (0, 0), (0, 0), (0, 0)))
    xcat = jnp.concatenate(
        [lax.dynamic_slice_in_dim(xp, k, d, axis=1) for k in range(kd)],
        axis=-1,
    )
    wcat = jnp.concatenate([w[k] for k in range(kd)], axis=-2)
    y = lax.conv_general_dilated(
        xcat.reshape(n * d, h, ww, kd * ci), wcat, (1, 1), "SAME",
        dimension_numbers=DN2,
    )
    return y.reshape(n, d, h, ww, -1)


def time_call(fn, *args, iters=10):
    r = fn(*args)
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, r
    )
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, r
    )
    return (time.time() - t0) / iters * 1e3


def bench_shape(tag, n, d, h, w, ci, co, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, d, h, w, ci), dtype)
    k = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.05, dtype)

    gflop = 2 * n * d * h * w * co * ci * 27 / 1e9

    f_nat = jax.jit(conv3d_native)
    f_slab = jax.jit(conv3d_slab)
    f_cat = jax.jit(conv3d_cat)

    # numerics check once per shape
    y1 = np.asarray(f_nat(x, k), np.float32)
    y2 = np.asarray(f_slab(x, k), np.float32)
    err = float(np.max(np.abs(y1 - y2)) / (np.max(np.abs(y1)) + 1e-9))
    log(f"{tag}_relerr", round(err, 5))
    y3 = np.asarray(f_cat(x, k), np.float32)
    errc = float(np.max(np.abs(y3 - y1)) / (np.max(np.abs(y1)) + 1e-9))
    log(f"{tag}_cat_relerr", round(errc, 5))

    ms_nat = time_call(f_nat, x, k)
    ms_slab = time_call(f_slab, x, k)
    ms_cat = time_call(f_cat, x, k)
    log(f"{tag}_fwd_native_ms", round(ms_nat, 3))
    log(f"{tag}_fwd_slab_ms", round(ms_slab, 3))
    log(f"{tag}_fwd_cat_ms", round(ms_cat, 3))
    log(f"{tag}_fwd_native_tf", round(gflop / ms_nat, 1))
    log(f"{tag}_fwd_slab_tf", round(gflop / ms_slab, 1))
    log(f"{tag}_fwd_cat_tf", round(gflop / ms_cat, 1))

    def loss_nat(xx, kk):
        return jnp.sum(jnp.square(conv3d_native(xx, kk)))

    def loss_slab(xx, kk):
        return jnp.sum(jnp.square(conv3d_slab(xx, kk)))

    def loss_cat(xx, kk):
        return jnp.sum(jnp.square(conv3d_cat(xx, kk)))

    g_nat = jax.jit(jax.grad(loss_nat, argnums=(0, 1)))
    g_slab = jax.jit(jax.grad(loss_slab, argnums=(0, 1)))
    g_cat = jax.jit(jax.grad(loss_cat, argnums=(0, 1)))
    ms_gnat = time_call(g_nat, x, k)
    ms_gslab = time_call(g_slab, x, k)
    ms_gcat = time_call(g_cat, x, k)
    log(f"{tag}_grad_native_ms", round(ms_gnat, 3))
    log(f"{tag}_grad_slab_ms", round(ms_gslab, 3))
    log(f"{tag}_grad_cat_ms", round(ms_gcat, 3))


def main():
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))

    # UNet3D f_maps=32 encoder shapes (batch 2, patch 64x128x128)
    bench_shape("l1_32to32", 2, 64, 128, 128, 32, 32)
    bench_shape("l2_64to64", 2, 32, 64, 64, 64, 64)
    bench_shape("l3_128to128", 2, 16, 32, 32, 128, 128)
    bench_shape("l4_256to256", 2, 8, 16, 16, 256, 256)
    # f_maps=64 first level (reference default width, batch 1)
    bench_shape("w64_l1", 1, 64, 128, 128, 64, 64)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
