"""Shim — the 2D training CLI lives in mdeical_image_segmentation_tpu.cli.train2d
(installed as the ``tpuseg-train`` console script)."""

from mdeical_image_segmentation_tpu.cli.train2d import main, parse_args  # noqa: F401

if __name__ == "__main__":
    main()
