"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths are
exercised without a TPU pod (SURVEY.md section 4: multi-device tests via
xla_force_host_platform_device_count).

NOTE: the axon TPU plugin ignores the JAX_PLATFORMS *environment variable*;
only ``jax.config.update("jax_platforms", ...)`` reliably forces CPU.  The
env vars are still set first (they must precede jax import for the XLA flag
to count), then the config update pins the platform.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_SCENES = pathlib.Path(
    os.environ.get("RTRT_REFERENCE_SCENES", "/root/reference/scenes")
)
REFERENCE_ASSETS = pathlib.Path(
    os.environ.get("RTRT_REFERENCE_ASSETS", "/root/reference/assets")
)


@pytest.fixture(scope="session")
def reference_scenes():
    if not REFERENCE_SCENES.exists():
        pytest.skip("reference scenes not available")
    return REFERENCE_SCENES


@pytest.fixture(scope="session")
def reference_assets():
    if not REFERENCE_ASSETS.exists():
        pytest.skip("reference assets not available")
    return REFERENCE_ASSETS
