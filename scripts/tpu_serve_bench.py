"""Serving under load: concurrency sweep against the batching engine on TPU.

Round-1 measured only single-request p50 (PERF.md).  This session starts the
real HTTP server with a jitted UNet_3Plus 256px forward, then sweeps client
concurrency and reports per-level p50/p90/p99 latency, throughput, and the
engine's measured batch occupancy — how well concurrent requests coalesce
into device batches.

Writes /tmp/tpu_serve_bench.json.
"""

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = {}


def log(k, v):
    RESULTS[k] = v
    print(json.dumps({k: v})[:1500], flush=True)
    with open("/tmp/tpu_serve_bench.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def start_server(port: int, max_batch: int = 8, max_wait_ms: float = 8.0):
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
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))

    @jax.jit
    def fwd(x):
        logits = model.apply(variables, x, train=False).logits
        return jax.nn.sigmoid(logits)

    def forward(x):
        return np.asarray(fwd(jnp.asarray(x)))

    # Pre-compile every batch shape the engine can form. With pad_to_pow2
    # the engine only ever runs {1, 2, 4, ..., max_batch}; remote compiles
    # take 30-200 s here and would trip the engine's 60 s inference timeout
    # if a cold shape were hit mid-sweep.
    b = 1
    while b <= max_batch:
        t0 = time.time()
        np.asarray(fwd(jnp.zeros((b, 256, 256, 3), jnp.float32)))
        print(f"warm batch={b}: {time.time() - t0:.1f}s", flush=True)
        b *= 2

    registry = ModelRegistry()
    registry.register(
        # dispatch/fetch enable the engine's round-4 two-stage pipeline
        # (decode/H2D of batch k+1 overlaps device execution of batch k)
        ModelEntry(name="vessel", forward=forward, in_channels=3,
                   resolution=256, threshold=0.5,
                   dispatch=lambda x: fwd(jnp.asarray(x)), fetch=np.asarray),
        default=True,
    )
    registry.register(
        # same jitted program, serial worker — the in-session A/B control
        ModelEntry(name="vessel_serial", forward=forward, in_channels=3,
                   resolution=256, threshold=0.5),
    )
    server = SegmentationServer(registry, max_batch=max_batch,
                                max_wait_ms=max_wait_ms)
    t = threading.Thread(
        target=server.serve_forever, args=("127.0.0.1", port), daemon=True
    )
    t.start()
    time.sleep(1.0)
    return server


def post(port, payload, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def sweep(port, image_path, concurrency, requests_per_client,
          ret_mode="path", model=None):
    lats, errs, sizes = [], [0], []
    lock = threading.Lock()

    def client():
        for _ in range(requests_per_client):
            t0 = time.perf_counter()
            try:
                payload = {"image_path": image_path, "return": ret_mode}
                if model:
                    payload["model"] = model
                out = post(port, payload)
                ok = out.get("status") == 200
                size = len(json.dumps(out.get("response", "")))
            except Exception:
                ok = False
                size = 0
            dt = time.perf_counter() - t0
            with lock:
                if ok:
                    lats.append(dt)
                    sizes.append(size)
                else:
                    errs[0] += 1

    threads = [threading.Thread(target=client) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lats.sort()
    pct = lambda p: lats[min(int(p / 100 * len(lats)), len(lats) - 1)] * 1e3
    n = len(lats)
    return {
        "concurrency": concurrency,
        "requests": n,
        "errors": errs[0],
        "p50_ms": round(pct(50), 1),
        "p90_ms": round(pct(90), 1),
        "p99_ms": round(pct(99), 1),
        "req_per_sec": round(n / wall, 2),
        "avg_payload_bytes": int(np.mean(sizes)) if sizes else 0,
    }


def main():
    from PIL import Image

    port = 6123
    img_path = "/tmp/serve_bench_input.png"
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(584, 565, 3) * 255).astype(np.uint8)).save(img_path)

    server = start_server(port)
    # warm: compile every batch shape the sweep can hit (1..max_batch)
    t0 = time.time()
    post(port, {"image_path": img_path})
    log("first_request_compile_s", round(time.time() - t0, 1))
    warm = sweep(port, img_path, 8, 4)
    log("warmup", warm)

    occ0 = server.engine.occupancy()
    for c in (1, 4, 8, 16):
        r = sweep(port, img_path, c, max(32 // c, 8))
        occ1 = server.engine.occupancy()
        v0 = occ0.get("vessel", {"batches": 0, "requests": 0})
        v1 = occ1["vessel"]
        db = v1["batches"] - v0["batches"]
        dr = v1["requests"] - v0["requests"]
        r["avg_batch_occupancy"] = round(dr / db, 2) if db else 0.0
        occ0 = occ1
        log(f"concurrency_{c}", r)

    # in-session A/B: the same jitted forward through the SERIAL worker
    # (no dispatch/fetch) at saturating concurrency — isolates the round-4
    # pipeline's contribution from tunnel-condition variance
    for c in (8, 16):
        log(f"serial_concurrency_{c}",
            sweep(port, img_path, c, max(32 // c, 8), model="vessel_serial"))
    for c in (8, 16):
        log(f"pipelined_concurrency_{c}_rep",
            sweep(port, img_path, c, max(32 // c, 8)))

    # return-mode comparison at saturation (round-3 item: the JSON
    # nested-list mask dominates response payloads; base64 PNG cuts it
    # ~100x — measure all three on the same setup)
    for mode in ("path", "mask", "png"):
        r = sweep(port, img_path, 8, 8, ret_mode=mode)
        log(f"retmode_{mode}_c8", r)

    log("server_stats", json.loads(
        urllib.request.urlopen(f"http://127.0.0.1:{port}/stats").read()
    ))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
