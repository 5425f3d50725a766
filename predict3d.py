"""Shim — the 3D prediction CLI lives in mdeical_image_segmentation_tpu.cli.predict3d
(installed as the ``tpuseg-predict3d`` console script)."""

from mdeical_image_segmentation_tpu.cli.predict3d import main  # noqa: F401

if __name__ == "__main__":
    main()
