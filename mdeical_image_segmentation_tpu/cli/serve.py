"""Serving CLI: segmentation-as-a-service with per-request model selection.

Replaces the reference's placeholder classifier endpoint (api/api.py) with
the README's intended contract (README.md:20-26,44-45): user-selectable
segmentation models behind one endpoint, returning masks.

    python serve_api.py --unet2d name=vessel,path=/path/to/saved_bundle \
        [--unet2d name=breast,path=...] [--port 6076]

Each ``--unet2d`` adds a 2D bundle saved via UNetModel.save_pretrained; the
first becomes the default.  ``--demo`` starts with a randomly-initialized
small UNet (for smoke-testing the API without trained weights).
"""

import argparse


def _parse_bool(key: str, value: str) -> bool:
    """Strict truthy/falsy parse — a typo like tta=mirror must not silently
    disable the option the user asked for."""
    v = value.lower()
    # 'mirror'/'mirror-hw' match the predictor config's tta spelling; for a
    # 2D model both mean the same H/W flip ensemble serve runs with tta=1.
    if v in ("1", "true", "yes", "on", "mirror", "mirror-hw"):
        return True
    if v in ("0", "false", "no", "off"):
        return False
    raise SystemExit(f"--unet2d {key}={value!r}: expected a boolean "
                     "(1/0, true/false, yes/no, on/off, mirror, mirror-hw)")


def main():
    parser = argparse.ArgumentParser(description="tpuseg serving API")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=6076)
    parser.add_argument("--output_dir", default="/tmp/tpuseg_masks")
    parser.add_argument("--max_batch", type=int, default=8)
    parser.add_argument("--max_wait_ms", type=float, default=5.0)
    parser.add_argument(
        "--unet2d", action="append", default=[],
        help="name=<model name>,path=<save_pretrained dir>[,resolution=512]"
             "[,quantize=int8][,calib_batches=1][,tta=1]"
    )
    parser.add_argument(
        "--exported", action="append", default=[],
        help="name=<model name>,path=<tpuseg-export artifact dir>"
             "[,threshold=0.5] — serve an AOT artifact (no model code)"
    )
    parser.add_argument(
        "--sam", action="append", default=[],
        help="name=<model name>,path=<save_sam dir> (promptable segmentation)"
    )
    parser.add_argument("--demo", action="store_true",
                        help="register an untrained demo model")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. 'cpu')")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mdeical_image_segmentation_tpu.serve import ModelRegistry, serve

    registry = ModelRegistry()
    for spec in args.unet2d:
        kv = dict(item.split("=", 1) for item in spec.split(","))
        registry.register_unet2d(
            kv["name"], kv["path"], resolution=int(kv.get("resolution", 512)),
            quantize=kv.get("quantize"),
            calib_batches=int(kv.get("calib_batches", 1)),
            tta=_parse_bool("tta", kv.get("tta", "0")),
        )
    for spec in args.exported:
        kv = dict(item.split("=", 1) for item in spec.split(","))
        registry.register_exported(
            kv["name"], kv["path"],
            threshold=float(kv.get("threshold", 0.5)),
        )
    for spec in args.sam:
        kv = dict(item.split("=", 1) for item in spec.split(","))
        registry.register_sam(kv["name"], kv["path"])

    if args.demo or not registry.names():
        import jax

        from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel

        model = UNetModel(UNetConfig(in_channels=1, out_channels=1,
                                     unet_type="UNet", base_features=8))
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jax.numpy.zeros((1, 256, 256, 1)),
        )
        import tempfile

        demo_dir = tempfile.mkdtemp(prefix="tpuseg_demo_")
        model.save_pretrained(demo_dir, variables)
        registry.register_unet2d("demo", demo_dir, resolution=256)

    serve(registry, host=args.host, port=args.port,
          output_dir=args.output_dir, max_batch=args.max_batch,
          max_wait_ms=args.max_wait_ms)


if __name__ == "__main__":
    main()
