"""Config loader: YAML + dotted overrides parity (reference config.py:33-75)."""

import os

import yaml

from mdeical_image_segmentation_tpu.configs import (
    apply_overrides,
    copy_config,
    load_config,
)


def _write_yaml(tmp_path):
    cfg = {
        "model": {"name": "UNet3D", "in_channels": 1, "out_channels": 2},
        "loss": {"name": "DiceLoss"},
        "loaders": {"test": {"slice_builder": {"patch_shape": [32, 64, 64]}}},
    }
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_load_and_override(tmp_path):
    path = _write_yaml(tmp_path)
    cfg = load_config(
        ["--config", path, "--loaders.test.slice_builder.patch_shape", "[16,32,32]",
         "--model.f_maps", "32"]
    )
    assert cfg["loaders"]["test"]["slice_builder"]["patch_shape"] == [16, 32, 32]
    assert cfg["model"]["f_maps"] == 32
    assert cfg.model.name == "UNet3D"  # attribute access


def test_equals_style_overrides():
    cfg = {"a": {"b": 1}}
    apply_overrides(cfg, ["a.b=2", "a.c=hello"])
    assert cfg["a"]["b"] == 2 and cfg["a"]["c"] == "hello"


def test_copy_config(tmp_path):
    path = _write_yaml(tmp_path)
    cfg = load_config(config_path=path)
    out = copy_config(cfg, str(tmp_path / "ckpt"), config_path=path)
    assert os.path.exists(out)
    assert os.path.exists(tmp_path / "ckpt" / "logs" / "cfg.yml")
