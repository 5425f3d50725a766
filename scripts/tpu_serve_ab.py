"""Interleaved pipelined-vs-serial serving A/B.

The first r4 sweep (tpu_serve_bench.py) showed tunnel throughput drifting
downward across the run, which confounds a blocked A/B (serial legs ran in
the middle, pipelined reps last).  This run alternates P/S legs at fixed
concurrency so drift cancels to first order, and reports per-arm medians.

Writes /tmp/tpu_serve_ab.json.
"""

import json
import os
import sys
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_serve_bench import start_server, sweep, post  # noqa: E402

import numpy as np

OUT = {}


def log(k, v):
    OUT[k] = v
    print(json.dumps({k: v})[:1000], flush=True)
    with open("/tmp/tpu_serve_ab.json", "w") as f:
        json.dump(OUT, f, indent=2)


def main():
    from PIL import Image

    port = 6127
    img_path = "/tmp/serve_bench_input.png"
    if not os.path.exists(img_path):
        rng = np.random.RandomState(0)
        Image.fromarray(
            (rng.rand(584, 565, 3) * 255).astype(np.uint8)).save(img_path)

    start_server(port)
    post(port, {"image_path": img_path})  # warm the engine end-to-end
    sweep(port, img_path, 8, 4)

    conc = 16
    arms = {"pipelined": None, "serial": "vessel_serial"}
    rps = {a: [] for a in arms}
    p50 = {a: [] for a in arms}
    for rep in range(5):
        for arm, model in arms.items():
            r = sweep(port, img_path, conc, 6, model=model)
            rps[arm].append(r["req_per_sec"])
            p50[arm].append(r["p50_ms"])
            log(f"rep{rep}_{arm}", r)
    for arm in arms:
        log(f"{arm}_median_rps", round(statistics.median(rps[arm]), 2))
        log(f"{arm}_median_p50", round(statistics.median(p50[arm]), 1))
    log("speedup_median",
        round(OUT["pipelined_median_rps"] / OUT["serial_median_rps"], 3))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
