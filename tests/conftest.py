"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding semantics are validated without TPU hardware (SURVEY.md §4d)."""

import os

# Force CPU: this session's sitecustomize registers the axon (real-TPU tunnel)
# PJRT plugin and pins jax.config.jax_platforms="axon,cpu", ignoring the
# JAX_PLATFORMS env var — remote compiles through the tunnel make tests ~100x
# slower. Override via jax.config before any jax use; mesh semantics are
# validated on 8 virtual CPU devices instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE_DIR = pathlib.Path("/root/reference")
EXAMPLES_DIR = REFERENCE_DIR / "examples"


@pytest.fixture(scope="session")
def example_midis():
    """All bundled example .mid files from the reference (golden artifacts)."""
    if not EXAMPLES_DIR.exists():
        pytest.skip("reference examples not available")
    return sorted(EXAMPLES_DIR.rglob("*.mid"))
