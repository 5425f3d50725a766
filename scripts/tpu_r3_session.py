"""Round-3 TPU measurement session (one process, one chip claim).

Phases (env-selected so partial reruns stay cheap):

  FUSED=1    fused 'gcr' Pallas block (ops/fused_conv.py) A/B on the UNet3D
             train step: baseline (TPUSEG_FUSED_CONV=off) vs fused, both
             im2col modes, f_maps 32 b2 and 64 b1.  VERDICT r2 item 1;
             bar: f32 b2 under ~95 ms/step (from 110.6) or an honest
             negative result.
  RESID=1    first ResidualUNet3D / ResidualUNetSE3D numbers: native 3D
             deconv vs the slab ConvTranspose3D lowering (ops/conv3d.py).
             VERDICT item 2; bar: residual family within ~1.3x of UNet3D
             at equal FLOPs.
  OVERLAP=1  probe whether the Pallas overlap-add DMA kernel compiles on
             this tunnel's remote-compile service (VERDICT item 7) and
             time it vs the XLA accumulate if it does.
  INFER=1    fused-forward inference rate (where the fused block's saved
             HBM passes show up undiluted by the backward).

Writes /tmp/tpu_r3_session.json as it goes.
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

OUT = {}
OUTPATH = "/tmp/tpu_r3_session.json"


def log(k, v):
    OUT[k] = v
    print(json.dumps({k: v})[:2000], flush=True)
    with open(OUTPATH, "w") as f:
        json.dump(OUT, f, indent=2)


def build_step(model_cfg, batch, patch):
    from mdeical_image_segmentation_tpu.losses import BCEDiceLoss
    from mdeical_image_segmentation_tpu.models import get_model

    model = get_model(dict(model_cfg, dtype=jnp.bfloat16))
    criterion = BCEDiceLoss()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, *patch, 1), jnp.float32)
    y = (x > 0.5).astype(jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], True)
    opt = optax.adam(1e-3)
    opt_state = opt.init(variables["params"])

    def step(params, opt_state, x, y, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, x, True, rngs={"dropout": rng})
            return criterion(out, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    return jstep, variables["params"], opt_state, x, y, jax.random.PRNGKey(1)


def time_step(name, model_cfg, batch=2, patch=(64, 128, 128), steps=15):
    try:
        jstep, params, opt_state, x, y, key = build_step(
            model_cfg, batch, patch
        )
        t0 = time.time()
        compiled = jstep.lower(params, opt_state, x, y, key).compile()
        log(f"{name}_compile_s", round(time.time() - t0, 1))
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            log(f"{name}_hbm_gb", round(ca.get("bytes accessed", 0) / 1e9, 2))
        except Exception:
            pass
        params, opt_state, loss = jstep(params, opt_state, x, y, key)
        l0 = float(loss)
        t0 = time.time()
        for _ in range(steps):
            params, opt_state, loss = jstep(params, opt_state, x, y, key)
        lf = float(loss)
        ms = (time.time() - t0) / steps * 1e3
        log(f"{name}_ms_per_step", round(ms, 2))
        log(f"{name}_patches_per_sec", round(batch / ms * 1e3, 2))
        if not (np.isfinite(l0) and np.isfinite(lf)):
            log(f"{name}_WARN", f"non-finite loss {l0} -> {lf}")
        return ms
    except Exception as e:
        log(f"{name}_error", f"{type(e).__name__}: {e}"[:400])
        return None


def time_forward(name, model_cfg, batch=2, patch=(64, 128, 128), steps=30):
    from mdeical_image_segmentation_tpu.models import get_model

    try:
        model = get_model(dict(model_cfg, dtype=jnp.bfloat16))
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(batch, *patch, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x[:1], False)

        fwd = jax.jit(lambda v, x: jnp.sum(model.apply(v, x, False)))
        _ = float(fwd(variables, x))
        t0 = time.time()
        acc = 0.0
        for _ in range(steps):
            acc = acc + fwd(variables, x)
        float(acc)
        ms = (time.time() - t0) / steps * 1e3
        log(f"{name}_fwd_ms", round(ms, 2))
        log(f"{name}_fwd_patches_per_sec", round(batch / ms * 1e3, 2))
    except Exception as e:
        log(f"{name}_error", f"{type(e).__name__}: {e}"[:400])


UNET3D = {"name": "UNet3D", "in_channels": 1, "out_channels": 1,
          "f_maps": 32, "num_levels": 4, "layer_order": "gcr"}


def phase_fused():
    os.environ["TPUSEG_FUSED_CONV"] = "off"
    base = time_step("gcr32b2_base", UNET3D)
    os.environ["TPUSEG_FUSED_CONV"] = "auto"
    fused = time_step("gcr32b2_fused_taps", UNET3D)  # default: naked taps
    os.environ["TPUSEG_FUSED_IM2COL"] = "1"
    time_step("gcr32b2_fused_im2col", UNET3D)
    os.environ.pop("TPUSEG_FUSED_IM2COL", None)

    os.environ["TPUSEG_FUSED_CONV"] = "off"
    time_step("gcr64b1_base", dict(UNET3D, f_maps=64), batch=1)
    os.environ["TPUSEG_FUSED_CONV"] = "auto"
    time_step("gcr64b1_fused", dict(UNET3D, f_maps=64), batch=1)
    os.environ["TPUSEG_FUSED_CONV"] = "off"
    if base and fused:
        log("fused_speedup_b2", round(base / fused, 3))


def phase_resid():
    resid = {"name": "ResidualUNet3D", "in_channels": 1, "out_channels": 1,
             "f_maps": 32, "num_levels": 5, "layer_order": "gcr"}
    os.environ["TPUSEG_CONV3D"] = "native"
    time_step("resid32b2_native", resid)
    os.environ["TPUSEG_CONV3D"] = "auto"  # slab convs + slab deconvs
    time_step("resid32b2_slab", resid)
    time_step("residse32b2_slab", dict(resid, name="ResidualUNetSE3D"))
    time_step("resid64b1_slab", dict(resid, f_maps=64), batch=1)
    # equal-footing UNet3D comparator at 5 levels
    time_step("unet3d32b2_5lvl", dict(UNET3D, num_levels=5))


def phase_overlap():
    from mdeical_image_segmentation_tpu.ops.overlap import (
        overlap_add_into_pallas, overlap_add_into_xla)

    acc = jnp.zeros((32, 64, 64, 1), jnp.float32)
    cnt = jnp.zeros_like(acc)
    patches = jnp.ones((4, 16, 32, 32, 1), jnp.float32)
    starts = jnp.asarray([[0, 0, 0], [8, 16, 16], [16, 32, 32], [0, 32, 0]],
                         jnp.int32)
    valid = jnp.ones((4,), jnp.float32)
    try:
        t0 = time.time()
        a, c = jax.jit(overlap_add_into_pallas)(
            acc, cnt, patches, starts, valid
        )
        s = float(jnp.sum(a))
        log("overlap_pallas_compile_s", round(time.time() - t0, 1))
        log("overlap_pallas_sum", s)
        ref_a, _ = jax.jit(overlap_add_into_xla)(
            acc, cnt, patches, starts, valid
        )
        log("overlap_pallas_matches_xla",
            bool(jnp.allclose(a, ref_a)))
    except Exception as e:
        log("overlap_pallas_error", f"{type(e).__name__}: {e}"[:500])


def phase_infer():
    os.environ["TPUSEG_FUSED_CONV"] = "off"
    time_forward("inf_gcr32b2_base", UNET3D)
    os.environ["TPUSEG_FUSED_CONV"] = "auto"
    time_forward("inf_gcr32b2_fused", UNET3D)
    os.environ["TPUSEG_FUSED_CONV"] = "off"


def time_step2d(name, base_features, batch, res=256, steps=40):
    """2D classic-UNet train step (bench.py methodology)."""
    try:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from bench import bench_unet2d

        r = bench_unet2d(base_features=base_features, batch=batch, res=res,
                         steps=steps)
        log(f"{name}_ms_per_step", round(r["ms_per_step"], 2))
        log(f"{name}_slices_per_sec", round(r["slices_per_sec"], 1))
    except Exception as e:
        log(f"{name}_error", f"{type(e).__name__}: {e}"[:400])


def phase_fused2d():
    """The base8/base16 north-star chase: fused DoubleConv A/B."""
    os.environ["TPUSEG_FUSED_CONV"] = "off"
    time_step2d("unet2d_b8_base", 8, 256)
    time_step2d("unet2d_b16_base", 16, 128)
    os.environ["TPUSEG_FUSED_CONV"] = "auto"
    time_step2d("unet2d_b8_fused", 8, 256)
    time_step2d("unet2d_b16_fused", 16, 128)
    os.environ["TPUSEG_FUSED_IM2COL"] = "1"
    time_step2d("unet2d_b8_fused_im2col", 8, 256)
    os.environ.pop("TPUSEG_FUSED_IM2COL", None)
    os.environ["TPUSEG_FUSED_CONV"] = "off"


def _time_fn(name, fn, *args, steps=30):
    try:
        jfn = jax.jit(fn)
        out = jfn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        t0 = time.time()
        acc = 0.0
        for _ in range(steps):
            out = jfn(*args)
            acc = acc + jnp.sum(out[0] if isinstance(out, tuple) else out)
        float(acc)
        ms = (time.time() - t0) / steps * 1e3
        log(f"{name}_ms", round(ms, 3))
        return ms
    except Exception as e:
        log(f"{name}_error", f"{type(e).__name__}: {e}"[:300])


def phase_pool():
    """3D pool/upsample lowering microbenches (the 'everything else' of the
    110.6 ms step: pooling 6.1 ms + a share of the 35.5 ms boundary
    relayouts).  Candidates mirror the conv slab trick: avoid native 3D
    windows/gathers, ride reshapes + 2D-friendly ops."""
    from jax import lax as jlax

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 128, 128, 32), jnp.bfloat16)

    def pool_native(v):
        return jlax.reduce_window(
            v, -jnp.inf, jlax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID"
        )

    def pool_reshape(v):
        n, d, h, w, c = v.shape
        v = v.reshape(n, d // 2, 2, h // 2, 2, w // 2, 2, c)
        return v.max(axis=(2, 4, 6))

    def pool_pairwise(v):
        v = jnp.maximum(v[:, ::2], v[:, 1::2])
        v = jnp.maximum(v[:, :, ::2], v[:, :, 1::2])
        return jnp.maximum(v[:, :, :, ::2], v[:, :, :, 1::2])

    def pool_2dwin(v):
        # depth pairwise + native 2D window over (H, W) on the folded batch
        n, d, h, w, c = v.shape
        v = jnp.maximum(v[:, ::2], v[:, 1::2]).reshape(n * d // 2, h, w, c)
        v = jlax.reduce_window(
            v, -jnp.inf, jlax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
        return v.reshape(n, d // 2, h // 2, w // 2, c)

    for nm, fn in [("pool_native", pool_native),
                   ("pool_reshape", pool_reshape),
                   ("pool_pairwise", pool_pairwise),
                   ("pool_2dwin", pool_2dwin)]:
        _time_fn(nm, fn, x)
        # fwd+bwd (what the train step pays)
        _time_fn(nm + "_grad",
                 jax.grad(lambda v, f=fn: jnp.sum(
                     f(v).astype(jnp.float32))), x)

    # nearest ×2 upsample: gather-based (current) vs broadcast-repeat
    from mdeical_image_segmentation_tpu.ops.image import interpolate_nearest_nd

    u = jnp.asarray(rng.rand(2, 32, 64, 64, 64), jnp.bfloat16)

    def up_current(v):
        return interpolate_nearest_nd(v, (64, 128, 128))

    def up_repeat(v):
        n, d, h, w, c = v.shape
        v = jnp.broadcast_to(
            v[:, :, None, :, None, :, None, :],
            (n, d, 2, h, 2, w, 2, c),
        )
        return v.reshape(n, 2 * d, 2 * h, 2 * w, c)

    _time_fn("up_gather", up_current, u)
    _time_fn("up_repeat", up_repeat, u)
    _time_fn("up_gather_grad",
             jax.grad(lambda v: jnp.sum(up_current(v).astype(jnp.float32))), u)
    _time_fn("up_repeat_grad",
             jax.grad(lambda v: jnp.sum(up_repeat(v).astype(jnp.float32))), u)


def main():
    t0 = time.time()
    _ = float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
    log("claim_s", round(time.time() - t0, 1))
    log("device", str(jax.devices()[0]))

    if os.environ.get("POOL"):
        phase_pool()
    if os.environ.get("FUSED2D"):
        phase_fused2d()
    if os.environ.get("FUSED"):
        phase_fused()
    if os.environ.get("RESID"):
        phase_resid()
    if os.environ.get("OVERLAP"):
        phase_overlap()
    if os.environ.get("INFER"):
        phase_infer()
    log("total_s", round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
