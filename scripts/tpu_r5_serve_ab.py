"""Interleaved drain-policy A/B for the pipelined serving engine (VERDICT
r4 item 5).

Round 4 measured the dispatch/fetch pipeline at 1.16× median rps over the
serial worker, but batch occupancy collapsed 6.0 → 3.2 at c16 because the
worker drains the queue twice per device cycle.  The 'fill' drain policy
(serve/app.py) keeps coalescing batch k+1 while batch k executes, gated on
a ``jax.Array.is_ready`` probe — this session decides the engine default.

Hygiene (PERF.md round-4 lesson): tunnel rps drifts −20% within a run, so
the two arms are interleaved rep-by-rep on ONE server (same warm programs);
the policy is flipped via the engine attribute between legs.  Per-arm
medians + per-leg batch occupancy deltas are reported.

Reference envelope being beaten: /root/reference/api/api.py:52-82 (serial
per-request Flask handler).

Writes /tmp/tpu_r5_serve_ab.json.
"""

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = {}


def log(k, v):
    OUT[k] = v
    print(json.dumps({k: v})[:1200], flush=True)
    with open("/tmp/tpu_r5_serve_ab.json", "w") as f:
        json.dump(OUT, f, indent=2)


def start_server(port: int, max_batch: int = 8, max_wait_ms: float = 8.0):
    import time

    import jax
    import jax.numpy as jnp

    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel
    from mdeical_image_segmentation_tpu.serve.app import (
        ModelEntry,
        ModelRegistry,
        SegmentationServer,
    )

    model = UNetModel(
        UNetConfig(in_channels=3, out_channels=1, unet_type="UNet_3Plus",
                   compute_dtype="bfloat16")
    )
    # jitted init: eager full-width UNet3Plus init crawls per-op through
    # the tunnel (r5 lesson — the 2026-08-21 rerun sat >30 min in init)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 3)))

    @jax.jit
    def fwd(x):
        logits = model.apply(variables, x, train=False).logits
        return jax.nn.sigmoid(logits)

    def forward(x):
        return np.asarray(fwd(jnp.asarray(x)))

    b = 1
    while b <= max_batch:
        t0 = time.time()
        np.asarray(fwd(jnp.zeros((b, 256, 256, 3), jnp.float32)))
        print(f"warm batch={b}: {time.time() - t0:.1f}s", flush=True)
        b *= 2

    registry = ModelRegistry()
    registry.register(
        ModelEntry(name="vessel", forward=forward, in_channels=3,
                   resolution=256, threshold=0.5,
                   dispatch=lambda x: fwd(jnp.asarray(x)), fetch=np.asarray,
                   ready=lambda h: bool(h.is_ready())),
        default=True,
    )
    server = SegmentationServer(registry, max_batch=max_batch,
                                max_wait_ms=max_wait_ms)
    import threading

    threading.Thread(target=server.serve_forever, args=("127.0.0.1", port),
                     daemon=True).start()
    time.sleep(1.0)
    return server


def main():
    from PIL import Image

    from tpu_serve_bench import post, sweep

    port = 6131
    img_path = "/tmp/serve_bench_input.png"
    if not os.path.exists(img_path):
        rng = np.random.RandomState(0)
        Image.fromarray(
            (rng.rand(584, 565, 3) * 255).astype(np.uint8)).save(img_path)

    server = start_server(port)
    post(port, {"image_path": img_path})  # end-to-end warm
    sweep(port, img_path, 8, 4)

    conc = 16
    arms = ("eager", "fill")
    rps = {a: [] for a in arms}
    p50 = {a: [] for a in arms}
    occs = {a: [] for a in arms}
    prev = server.engine.occupancy().get("vessel", {"batches": 0,
                                                    "requests": 0})
    for rep in range(5):
        for arm in arms:
            server.engine.drain_policy = arm
            r = sweep(port, img_path, conc, 6)
            cur = server.engine.occupancy()["vessel"]
            db = cur["batches"] - prev["batches"]
            dr = cur["requests"] - prev["requests"]
            prev = cur
            r["avg_batch_occupancy"] = round(dr / db, 2) if db else 0.0
            rps[arm].append(r["req_per_sec"])
            p50[arm].append(r["p50_ms"])
            occs[arm].append(r["avg_batch_occupancy"])
            log(f"rep{rep}_{arm}", r)
    for arm in arms:
        log(f"{arm}_median", {
            "rps": round(statistics.median(rps[arm]), 2),
            "p50_ms": round(statistics.median(p50[arm]), 1),
            "occupancy": round(statistics.median(occs[arm]), 2),
            "wins": sum(f > e for f, e in zip(rps["fill"], rps["eager"])),
        })
    log("fill_over_eager_rps", round(
        statistics.median(rps["fill"]) / statistics.median(rps["eager"]), 3))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
