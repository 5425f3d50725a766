"""TPU profile session: trace the 2D UNet train step and rank op costs.

Captures a jax.profiler xplane trace of steady-state steps, parses it with
TensorFlow's xplane protos, and prints the top self-time ops — the
profile-guided-optimization input for the perf work.

Writes /tmp/tpu_profile_summary.json.
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


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

    return jax.jit(step, donate_argnums=(0, 1)), variables["params"], opt_state, x, y


def parse_xplane(logdir):
    """Top ops by self time from the device plane of the xplane trace."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not files:
        return {"error": "no trace files"}
    xspace = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    op_time = {}
    total = 0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            for event in line.events:
                meta = plane.event_metadata.get(event.metadata_id)
                name = meta.name if meta else str(event.metadata_id)
                dur = event.duration_ps / 1e9  # ms
                op_time[name] = op_time.get(name, 0.0) + dur
                total += dur
    top = sorted(op_time.items(), key=lambda kv: -kv[1])[:30]
    return {"planes_total_ms": round(total, 2),
            "top_ops_ms": [(n[:120], round(t, 3)) for n, t in top]}


def main():
    t0 = time.time()
    jstep, params, opt_state, x, y = build_step()
    params, opt_state, loss = jstep(params, opt_state, x, y)
    print(json.dumps({"claim_plus_compile_s": round(time.time() - t0, 1)}),
          flush=True)

    # steady state, then trace 5 steps
    for _ in range(3):
        params, opt_state, loss = jstep(params, opt_state, x, y)
    float(loss)
    logdir = "/tmp/prof_tpu"
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        params, opt_state, loss = jstep(params, opt_state, x, y)
    float(loss)
    jax.profiler.stop_trace()
    print(json.dumps({"traced": True}), flush=True)

    summary = parse_xplane(logdir)
    with open("/tmp/tpu_profile_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary)[:4000], flush=True)

    # quick experiment: bf16 optimizer moments (HBM traffic cut)
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel

    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                   base_features=64, compute_dtype="bfloat16")
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(32, 256, 256, 1), jnp.float32)
    y = (x > 0.5).astype(jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    opt = optax.adamw(1e-3, mu_dtype=jnp.bfloat16)
    opt_state = opt.init(variables["params"])

    def step(params, opt_state, x, y):
        def loss_fn(p):
            return model.apply({"params": p}, x, y, train=True).loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep2 = jax.jit(step, donate_argnums=(0, 1))
    p, o = variables["params"], opt_state
    p, o, l = jstep2(p, o, x, y)
    float(l)
    t0 = time.time()
    for _ in range(30):
        p, o, l = jstep2(p, o, x, y)
    float(l)
    dt = (time.time() - t0) / 30 * 1e3
    print(json.dumps({"bf16_mu_ms_per_step": round(dt, 2)}), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
