"""YAML config tree with dotted-path CLI overrides.

Mirrors the reference's config surface (model/unet3d/config.py:13-75): a YAML
file with sections ``model`` / ``loss`` / ``eval_metric`` / ``optimizer`` /
``lr_scheduler`` / ``trainer`` / ``loaders``, plus CLI overrides addressed by
dotted paths (``--loaders.test.slice_builder.patch_shape [64,128,128]``), and
``copy_config`` snapshotting the resolved config next to the checkpoints.

We keep configs as plain nested dicts (a `Config` is a thin dict wrapper with
attribute access) rather than a rigid dataclass tree so that reference YAML
files translate mechanically, unknown keys warn instead of crash, and
registries consume ``config['name']`` + kwargs exactly like the reference's
``get_class(...)(**config)`` pattern.
"""

from __future__ import annotations

import argparse
import ast
import copy
import os
import shutil
from typing import Any, Dict, List, Optional, Sequence

import yaml


class Config(dict):
    """A dict with attribute access and recursive wrapping."""

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError:
            raise AttributeError(name) from None
        if isinstance(v, dict) and not isinstance(v, Config):
            # wrap IN PLACE (not a throwaway copy) so nested attribute
            # writes like ``cfg.trainer.max_epochs = 5`` mutate this tree
            # instead of silently vanishing into a temporary
            v = Config(v)
            self[name] = v
        return v

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value


def _parse_value(raw: str) -> Any:
    """Parse a CLI override value: python literal if possible, then a YAML
    scalar (overrides target YAML-sourced trees, so ``false``/``true``/
    ``null`` must parse with the same semantics as the file they override —
    a bare-string fallback would leave ``'false'``, which is truthy), else
    keep the raw string."""
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        pass
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def _set_dotted(cfg: Dict[str, Any], dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
        if not isinstance(node, dict):
            raise TypeError(f"cannot override {dotted}: {k} is not a mapping")
    node[keys[-1]] = value


def apply_overrides(cfg: Dict[str, Any], overrides: Sequence[str]) -> Dict[str, Any]:
    """Apply ``["a.b.c=value", ...]`` or ``["--a.b.c", "value", ...]`` overrides."""
    i = 0
    toks = list(overrides)
    while i < len(toks):
        tok = toks[i]
        if "=" in tok:
            key, _, raw = tok.lstrip("-").partition("=")
            i += 1
        else:
            key = tok.lstrip("-")
            if i + 1 >= len(toks):
                raise ValueError(f"override {tok!r} missing a value")
            raw = toks[i + 1]
            i += 2
        _set_dotted(cfg, key, _parse_value(raw))
    return cfg


def load_config(
    argv: Optional[List[str]] = None,
    *,
    config_path: Optional[str] = None,
    overrides: Sequence[str] = (),
) -> Config:
    """Load a YAML config with dotted CLI overrides.

    Callable either programmatically (``load_config(config_path=..., overrides=...)``)
    or CLI-style (``load_config(sys.argv[1:])`` where argv contains ``--config``
    followed by free-form ``--dotted.path value`` pairs, matching the reference's
    parser at model/unet3d/config.py:33-46).
    """
    if config_path is None:
        parser = argparse.ArgumentParser(description="tpuseg config loader")
        parser.add_argument("--config", type=str, required=True)
        args, unknown = parser.parse_known_args(argv)
        config_path = args.config
        overrides = list(overrides) + unknown

    with open(config_path) as f:
        cfg = yaml.safe_load(f) or {}
    apply_overrides(cfg, overrides)

    # Device note: the reference warns + falls back CUDA→CPU
    # (config.py:48-59). Here the analogous knob is the JAX platform; we only
    # record what was requested — jax picks tpu/cpu automatically.
    cfg.setdefault("device", "auto")
    return Config(cfg)


def copy_config(config: Dict[str, Any], checkpoint_dir: str, config_path: Optional[str] = None) -> str:
    """Snapshot the resolved config into the checkpoint dir.

    Reference: ``copy_config`` (model/unet3d/config.py:62-75) copies the YAML
    into the latest checkpoint log dir; we dump the *resolved* config (after
    overrides) which is strictly more reproducible.
    """
    os.makedirs(os.path.join(checkpoint_dir, "logs"), exist_ok=True)
    out = os.path.join(checkpoint_dir, "logs", "config.yml")
    with open(out, "w") as f:
        yaml.safe_dump(_plain(config), f, sort_keys=False)
    if config_path is not None and os.path.exists(config_path):
        shutil.copy2(config_path, os.path.join(checkpoint_dir, "logs", os.path.basename(config_path)))
    return out


def _plain(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return copy.deepcopy(obj)
