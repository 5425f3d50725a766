"""One-shot TPU performance session: acquire the chip once, run every
measurement, dump JSON.  Run in the background; results land in
/tmp/tpu_perf.json (and stdout).

Measurements:
- 2D UNet train throughput across widths/batches (bf16)
- 3D UNet3D train throughput (bf16 gcr)
- sliding-window inference throughput with device overlap-add
- serving-style single-image latency (batch-1 jitted forward)
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

RESULTS = {}


def log(k, v):
    RESULTS[k] = v
    print(json.dumps({k: v}), flush=True)
    with open("/tmp/tpu_perf.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def main():
    t0 = time.time()
    x = jnp.ones((128, 128))
    float((x @ x).sum())
    log("claim_acquire_s", round(time.time() - t0, 1))
    log("device", str(jax.devices()[0]))

    from bench import bench_unet2d, bench_unet3d

    for base, batch in [(64, 32), (64, 64), (32, 64), (16, 128), (16, 256)]:
        try:
            r = bench_unet2d(base_features=base, batch=batch, steps=30)
            log(f"unet2d_base{base}_b{batch}", {k: round(v, 2) if isinstance(v, float) else v for k, v in r.items()})
        except Exception as e:
            log(f"unet2d_base{base}_b{batch}", f"{type(e).__name__}: {e}")

    for f_maps, batch, patch in [(32, 2, (64, 128, 128)), (64, 1, (64, 128, 128)), (32, 4, (32, 128, 128))]:
        try:
            r = bench_unet3d(f_maps=f_maps, batch=batch, patch=patch, steps=15)
            log(f"unet3d_f{f_maps}_b{batch}_{'x'.join(map(str, patch))}",
                {k: (round(v, 2) if isinstance(v, float) else v) for k, v in r.items()})
        except Exception as e:
            log(f"unet3d_f{f_maps}_b{batch}", f"{type(e).__name__}: {e}")

    # serving latency: batch-1 UNet_3Plus 256px forward (the serve hot path)
    try:
        from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel

        model = UNetModel(UNetConfig(in_channels=1, out_channels=1,
                                     unet_type="UNet_3Plus",
                                     compute_dtype="bfloat16"))
        img = jnp.asarray(np.random.rand(1, 256, 256, 1), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), img)

        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False).logits)
        np.asarray(fwd(v, img))  # compile
        lats = []
        for _ in range(30):
            t = time.time()
            np.asarray(fwd(v, img))
            lats.append((time.time() - t) * 1e3)
        lats.sort()
        log("serve_unet3plus_256_batch1_ms",
            {"p50": round(lats[15], 2), "p90": round(lats[27], 2)})
    except Exception as e:
        log("serve_latency", f"{type(e).__name__}: {e}")

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
