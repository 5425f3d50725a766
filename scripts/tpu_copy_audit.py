"""TPU copy audit: WHERE do the 22 ms/step of layout copies come from?

Round-1 profiling (PERF.md) showed 27% of the UNet base64 train step in
layout/copy ops and attributed them to fwd/bwd conv kernel-layout
disagreement.  This session gets the ground truth:

1. compiles the train step for TPU and parses the optimized HLO — every
   `copy` instruction with its shape+layout, aggregated by byte count;
2. traces steady-state steps and attributes per-op self time, joining the
   HLO copy names with their measured cost.

Writes /tmp/tpu_copy_audit.json.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

OUT = {}


def log(k, v):
    OUT[k] = v
    print(json.dumps({k: v})[:2000], flush=True)
    with open("/tmp/tpu_copy_audit.json", "w") as f:
        json.dump(OUT, f, indent=2)


def build_step(base=64, batch=32, res=256):
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel

    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                   base_features=base, compute_dtype="bfloat16")
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, res, res, 1), jnp.float32)
    y = (x > 0.5).astype(jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    opt = optax.adamw(1e-3)
    opt_state = opt.init(variables["params"])

    def step(params, opt_state, x, y):
        def loss_fn(p):
            return model.apply({"params": p}, x, y, train=True).loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step, variables["params"], opt_state, x, y


DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}


def shape_bytes(shape_str):
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def audit_hlo(txt):
    copies = []
    # e.g.  %copy.7 = f32[3,3,64,128]{2,3,1,0:T(8,128)} copy(%p)
    for m in re.finditer(
        r"%?([\w.\-]+) = (\w+\[[\d,]*\][^ ]*) copy\(", txt
    ):
        name, shape = m.group(1), m.group(2)
        copies.append((name, shape, shape_bytes(shape)))
    total = sum(b for _, _, b in copies)
    by_shape = {}
    for _, shape, b in copies:
        by_shape[shape] = by_shape.get(shape, [0, 0])
        by_shape[shape][0] += 1
        by_shape[shape][1] += b
    top = sorted(by_shape.items(), key=lambda kv: -kv[1][1])[:25]
    convs = re.findall(r"= (\w+\[[\d,]*\][^ ]*) convolution\(", txt)
    return {
        "n_copies": len(copies),
        "copy_bytes_total_mb": round(total / 1e6, 1),
        "top_copy_shapes": [
            {"shape": s, "count": c, "mb": round(b / 1e6, 2)}
            for s, (c, b) in top
        ],
        "n_convolutions": len(convs),
        "copy_names": [c[0] for c in copies][:200],
    }


def parse_trace(logdir):
    import glob

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not files:
        return {"error": "no trace files"}
    xspace = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    op_time = {}
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for event in line.events:
                meta = plane.event_metadata.get(event.metadata_id)
                name = meta.name if meta else str(event.metadata_id)
                op_time[name] = op_time.get(name, 0.0) + event.duration_ps / 1e9
    return op_time


def main():
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))

    step, params, opt_state, x, y = build_step()
    jstep = jax.jit(step, donate_argnums=(0, 1))

    t0 = time.time()
    lowered = jstep.lower(params, opt_state, x, y)
    compiled = lowered.compile()
    log("compile_s", round(time.time() - t0, 1))
    try:
        txt = compiled.as_text()
        log("hlo_audit", audit_hlo(txt))
        with open("/tmp/tpu_step_hlo.txt", "w") as f:
            f.write(txt)
    except Exception as e:
        log("hlo_audit", f"{type(e).__name__}: {str(e)[:200]}")

    # steady state + trace
    params, opt_state, loss = jstep(params, opt_state, x, y)
    float(loss)
    t0 = time.time()
    for _ in range(30):
        params, opt_state, loss = jstep(params, opt_state, x, y)
    float(loss)
    log("ms_per_step", round((time.time() - t0) / 30 * 1e3, 2))

    logdir = "/tmp/prof_copy_audit"
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        params, opt_state, loss = jstep(params, opt_state, x, y)
    float(loss)
    jax.profiler.stop_trace()
    op_time = parse_trace(logdir)
    if isinstance(op_time, dict) and "error" not in op_time:
        items = sorted(op_time.items(), key=lambda kv: -kv[1])
        copies = [(n, t) for n, t in items if "copy" in n.lower()]
        log("copy_ms_per_step",
            round(sum(t for _, t in copies) / 5, 2))
        log("top_copies_ms_over_5_steps",
            [(n[:100], round(t, 2)) for n, t in copies[:20]])
        log("top_ops_ms_over_5_steps",
            [(n[:100], round(t, 2)) for n, t in items[:25]])
    else:
        log("trace", str(op_time)[:200])
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
