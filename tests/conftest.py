"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test session so the
multi-chip sharding tests can exercise real pjit/shard_map partitioning
without TPU hardware.
"""

import os

import re

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
_m = re.search(r"xla_force_host_platform_device_count=(\d+)", _flags)
if _m is None:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
elif int(_m.group(1)) < 8:
    # a smaller pre-set count would make the 8-device mesh tests fail
    # with opaque partitioning errors — raise the count
    os.environ["XLA_FLAGS"] = re.sub(
        r"xla_force_host_platform_device_count=\d+",
        "xla_force_host_platform_device_count=8", _flags,
    )

import jax  # noqa: E402

# The sandbox sitecustomize force-registers the axon TPU backend and resets
# JAX_PLATFORMS; override at the config level so tests run on the virtual
# 8-device CPU mesh. The update raises if a backend is already initialized
# (e.g. a plugin touched jax.devices() first) — surface that clearly.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception as _exc:  # pragma: no cover
    raise RuntimeError(
        "tests require the virtual CPU mesh but the JAX backend was "
        "already initialized before conftest ran — do not import jax "
        f"devices in plugins before the test session ({_exc})"
    ) from _exc

assert jax.device_count() >= 8, (
    f"expected >= 8 virtual CPU devices, got {jax.device_count()} "
    f"(XLA_FLAGS={os.environ.get('XLA_FLAGS')!r})"
)

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
