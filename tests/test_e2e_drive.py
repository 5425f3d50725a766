"""Real-data-layout end-to-end smoke: DRIVE tree on disk → CLI train →
eval → serve from the saved bundle.

The reference trains on DRIVE PNGs from disk (reference
dataset/unet2d_dataset/MYDataset.py:76-94, train.py:114-160) and the README
promises serving the trained segmentation model.  No DRIVE data exists in
this environment, so this test writes a synthetic-but-faithful DRIVE
directory layout (RGB ``images/*.png`` + binary ``labels/*.png``, mixed
source sizes to exercise the nearest-resize path), drives the REAL
``train.py`` CLI entry point on it, and serves the resulting
``final/`` bundle through the real HTTP server — closing the loop that the
individually-tested pieces compose.
"""

import http.client
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image


def _vessel_sample(rng: np.random.RandomState, size: int):
    """A retina-ish image/label pair: dark background disc + bright curved
    'vessels'; the label marks the vessel pixels."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    c = size / 2
    disc = ((yy - c) ** 2 + (xx - c) ** 2) < (0.48 * size) ** 2

    mask = np.zeros((size, size), bool)
    for _ in range(3):
        phase = rng.rand() * 2 * np.pi
        amp = size * (0.1 + 0.2 * rng.rand())
        row0 = size * (0.2 + 0.6 * rng.rand())
        curve = row0 + amp * np.sin(2 * np.pi * xx / size + phase)
        mask |= np.abs(yy - curve) < max(size * 0.04, 2)
    mask &= disc

    img = np.zeros((size, size, 3), np.float32)
    img[..., 0] = 0.35 * disc + 0.5 * mask + 0.05 * rng.rand(size, size)
    img[..., 1] = 0.15 * disc + 0.35 * mask + 0.05 * rng.rand(size, size)
    img[..., 2] = 0.08 * disc + 0.05 * rng.rand(size, size)
    return (img * 255).astype(np.uint8), mask.astype(np.uint8) * 255


def _write_drive_tree(root, n=20):
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "images"))
    os.makedirs(os.path.join(root, "labels"))
    for i in range(n):
        size = [56, 64, 80][i % 3]  # mixed source sizes → resize exercised
        img, lbl = _vessel_sample(rng, size)
        Image.fromarray(img).save(
            os.path.join(root, "images", f"{i:02d}_training.png"))
        Image.fromarray(lbl).save(
            os.path.join(root, "labels", f"{i:02d}_manual1.png"))


def test_drive_tree_train_eval_serve(tmp_path, monkeypatch):
    data_dir = tmp_path / "DRIVE"
    _write_drive_tree(str(data_dir))

    import train as train_cli

    monkeypatch.setattr(sys, "argv", [
        "train.py",
        "--data_path", str(data_dir),
        "--unet_type", "UNet",
        "--resolution", "64",
        "--base_features", "8",
        "--in_channels", "3",
        "--max_steps", "100",
        "--eval_strategy", "steps",
        "--eval_steps", "50",
        "--logging_steps", "50",
        "--save_steps", "1000",
        "--per_device_train_batch_size", "4",
        "--per_device_eval_batch_size", "4",
        "--learning_rate", "0.005",
        "--output_dir", str(tmp_path / "out"),
    ])
    output_dir = train_cli.main()

    bundle = os.path.join(output_dir, "final")
    assert os.path.exists(os.path.join(bundle, "config.json"))
    assert os.path.exists(os.path.join(bundle, "params.msgpack"))

    # --- serve the bundle over real HTTP and segment a held-out image ----
    from mdeical_image_segmentation_tpu.serve.app import (
        ModelRegistry, SegmentationServer)

    registry = ModelRegistry()
    registry.register_unet2d("drive", bundle, resolution=64, default=True)
    server = SegmentationServer(
        registry, output_dir=str(tmp_path / "serve")
    )
    httpd = server.start(host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    try:
        # any tree image works as a serving smoke input
        img_path = os.path.join(str(data_dir), "images", "01_training.png")
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request(
            "POST", "/",
            json.dumps({"image_path": img_path, "return": "mask"}),
            {"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 200, body
        mask = np.asarray(body["response"])
        assert mask.shape == (64, 64)

        # the 150-step model must have learned *something* real: served mask
        # overlaps the ground-truth vessels far better than chance
        gt = np.asarray(
            Image.open(os.path.join(str(data_dir), "labels",
                                    "01_manual1.png")).convert("L")
        )
        from mdeical_image_segmentation_tpu.data.png2d import nearest_resize

        gt64 = (nearest_resize(gt, (64, 64)) > 127).astype(np.float32)
        inter = float((mask * gt64).sum())
        dice = 2 * inter / max(float(mask.sum() + gt64.sum()), 1.0)
        assert dice > 0.35, f"served dice {dice:.3f} — model did not train"
    finally:
        server.stop()
