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


def test_yaml_scalar_overrides_parse_like_the_files_they_override():
    """'--model.final_sigmoid false' must yield False, not the truthy string
    'false' — override values target YAML-sourced trees, so they parse with
    YAML scalar semantics when they aren't python literals (round-3 review
    finding)."""
    cfg = {"model": {"final_sigmoid": True, "f_maps": 64}}
    apply_overrides(
        cfg,
        ["model.final_sigmoid=false", "model.extra=null",
         "model.flag=true", "model.name=UNet3D"],
    )
    assert cfg["model"]["final_sigmoid"] is False
    assert cfg["model"]["extra"] is None
    assert cfg["model"]["flag"] is True
    assert cfg["model"]["name"] == "UNet3D"  # plain strings stay strings


def test_nested_attribute_writes_persist():
    """cfg.trainer.max_epochs = 5 must mutate the tree, not a throwaway
    wrapper copy (round-3 review finding)."""
    from mdeical_image_segmentation_tpu.configs.config import Config

    cfg = Config({"trainer": {"max_epochs": 1}, "model": {"f_maps": 8}})
    cfg.trainer.max_epochs = 5
    assert cfg["trainer"]["max_epochs"] == 5
    cfg.model.new_key = "x"
    assert cfg["model"]["new_key"] == "x"
