"""Shim — the serving CLI lives in mdeical_image_segmentation_tpu.cli.serve
(installed as the ``tpuseg-serve`` console script)."""

from mdeical_image_segmentation_tpu.cli.serve import main  # noqa: F401

if __name__ == "__main__":
    main()
