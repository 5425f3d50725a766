"""Round-4b TPU session: validate the depth2d pool default flip across the
3D family (UNet3D f32/f64, ResidualUNet3D, config-of-record patch), re-run
the XLA compiler-option sweep with fresh buffers per option (the r4 run
donated its baseline args away), and profile the depth2d 3D step + the 2D
base8 step.  Writes /tmp/tpu_r4b.json.
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
import optax

from tpu_r4_session import build2d, build3d, compile_with, time_compiled

OUT = {}


def log(k, v):
    OUT[k] = v
    print(json.dumps({k: v})[:2000], flush=True)
    with open("/tmp/tpu_r4b.json", "w") as f:
        json.dump(OUT, f, indent=2)


def profile_step(tag, jstep, args, steps=5):
    from _tpu_prof_util import (categorize, hlo_fusion_classifier,
                                serialized_op_times)

    compiled = compile_with(jstep, args)
    txt = compiled.as_text()
    with open(f"/tmp/tpu_r4b_{tag}_hlo.txt", "w") as f:
        f.write(txt)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        log(f"{tag}_hbm_gb", round(ca.get("bytes accessed", 0) / 1e9, 2))
    except Exception as e:
        log(f"{tag}_cost_analysis", str(e)[:150])
    classify = hlo_fusion_classifier(txt)

    import shutil
    import tempfile

    params, opt_state, *rest = args
    params, opt_state, loss = compiled(params, opt_state, *rest)
    float(loss)
    logdir = tempfile.mkdtemp(prefix=f"prof_{tag}_")
    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        params, opt_state, loss = compiled(params, opt_state, *rest)
    jax.profiler.stop_trace()
    float(loss)
    op_time, total = serialized_op_times(logdir)
    shutil.rmtree(logdir, ignore_errors=True)
    cats = categorize(op_time, classify)
    log(f"{tag}_serialized_ms", round(total / steps, 2))
    log(f"{tag}_breakdown_ms",
        {c: round(t / steps, 2) for c, t in
         sorted(cats.items(), key=lambda kv: -kv[1])})
    top = sorted(op_time.items(), key=lambda kv: -kv[1])[:15]
    log(f"{tag}_top_ops_ms", [(n[:100], round(t / steps, 3)) for n, t in top])


def main():
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))

    # ---------- depth2d default ('auto') across the 3D family ----------
    # TPUSEG_POOL unset => auto => depth2d on TPU after the flip
    os.environ.pop("TPUSEG_POOL", None)
    fam = [
        ("f32_b2", dict()),
        ("f64_b1", dict(f_maps=64, batch=1)),
        ("resid32_b2", dict(model_name="ResidualUNet3D")),
        ("cor_f64_b1_80x170x170", dict(f_maps=64, batch=1,
                                       patch=(80, 170, 170))),
    ]
    for tag, kw in fam:
        built = build3d(**kw)
        jstep, rest = built[0], built[1:]
        ms = time_compiled(jstep, rest, steps=15)
        log(f"3d_{tag}_auto_ms", round(ms, 2))
        del jstep, rest, built

    # ---------- compiler-option sweep, fresh buffers per option ----------
    option_sets = {
        "vmem32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
        "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
        "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    }
    for tag, build, kw in (
        ("3d_f32_b2", build3d, dict()),
        ("2d_base64_b32", build2d, dict()),
        ("2d_base8_b256", build2d, dict(base=8, batch=256)),
    ):
        for name, opts in [("none", None)] + list(option_sets.items()):
            try:
                built = build(**kw)  # fresh params/opt per option (donation)
                jstep, rest = built[0], built[1:]
                c = compile_with(jstep, rest, opts)
                ms = time_compiled(c, rest)
                log(f"{tag}_opts-{name}_ms", round(ms, 2))
                del c, jstep, rest, built
            except Exception as e:
                log(f"{tag}_opts-{name}_error",
                    f"{type(e).__name__}: {e}"[:200])

    # ---------- profiles: 3D f32 b2 under depth2d; 2D base8 ----------
    built = build3d()
    profile_step("3d_f32_b2_auto", built[0], built[1:])
    del built
    built = build2d(base=8, batch=256)
    profile_step("2d_base8", built[0], built[1:])
    del built

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
