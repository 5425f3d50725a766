"""Console entry points (installed as ``tpuseg-*`` scripts via pyproject).

The reference is run by cd-ing into its checkout (`python train.py ...`,
/root/reference/train.py, scripts/train.sh); the rebuild is an installable
package — ``pip install -e .`` provides:

- ``tpuseg-train``     — 2D training CLI (cli.train2d)
- ``tpuseg-train3d``   — config-driven 3D training (cli.train3d)
- ``tpuseg-predict3d`` — sliding-window 3D prediction (cli.predict3d)
- ``tpuseg-serve``     — the segmentation serving API (cli.serve)

The repo-root ``train.py`` / ``train3d.py`` / ``predict3d.py`` /
``serve_api.py`` remain as thin shims for in-checkout use.
"""
