"""Shim — the 3D training CLI lives in mdeical_image_segmentation_tpu.cli.train3d
(installed as the ``tpuseg-train3d`` console script)."""

from mdeical_image_segmentation_tpu.cli.train3d import main  # noqa: F401

if __name__ == "__main__":
    main()
