"""Test harness: force an 8-device CPU mesh (the TPU-idiomatic substitute for
fake process groups — SURVEY.md §4's multi-device test strategy).

Must run before any jax array op: XLA_FLAGS via env (read at backend init),
platform via jax.config (the axon TPU plugin registers itself in
sitecustomize and pins jax_platforms, so the config update is required)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
