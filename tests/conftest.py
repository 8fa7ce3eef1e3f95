"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test session so the
multi-chip sharding tests can exercise real pjit/shard_map partitioning
without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox sitecustomize force-registers the axon TPU backend and resets
# JAX_PLATFORMS; override at the config level so tests run on the virtual
# 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_PATH = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_PATH)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference checkout not available"
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test (full trainer "
        "loop / end-to-end pipeline)")
