"""Packaging contract: the framework is installable (pyproject.toml) with
console entry points, unlike the reference's cd-into-checkout workflow
(/root/reference/requirements.txt:1 is its only dependency manifest).

These tests run from the checkout: they assert the entry-point targets
resolve and the root shims still expose ``main`` for in-checkout use."""

import importlib
import os
import sys

try:  # py3.11+: stdlib tomllib
    import tomllib
except ImportError:  # pragma: no cover
    tomllib = None

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_pyproject():
    if tomllib is None:
        pytest.skip("tomllib unavailable")
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_entry_points_resolve():
    proj = _load_pyproject()["project"]
    scripts = proj["scripts"]
    assert set(scripts) == {
        "tpuseg-train", "tpuseg-train3d", "tpuseg-predict3d", "tpuseg-serve",
        "tpuseg-export",
    }
    for target in scripts.values():
        mod_name, func = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func))


def test_dependency_manifest_covers_hard_imports():
    """Every hard (module-level, ungated) third-party import in the package
    must appear in [project.dependencies]."""
    proj = _load_pyproject()["project"]
    deps = " ".join(proj["dependencies"]).lower()
    for mod, dist in [
        ("jax", "jax"), ("flax", "flax"), ("optax", "optax"),
        ("numpy", "numpy"), ("h5py", "h5py"), ("yaml", "pyyaml"),
        ("PIL", "pillow"), ("imageio", "imageio"),
        ("sklearn", "scikit-learn"), ("scipy", "scipy"),
    ]:
        assert dist in deps, f"{mod} imported but {dist} not declared"


def test_root_shims_expose_main():
    sys.path.insert(0, REPO)
    try:
        for name in ("train", "train3d", "predict3d", "serve_api"):
            mod = importlib.import_module(name)
            assert callable(mod.main)
    finally:
        sys.path.remove(REPO)
