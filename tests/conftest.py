"""Test configuration: run everything on a virtual 8-device CPU mesh.

Environment note: this machine's sitecustomize imports jax and registers the
'axon' TPU platform before pytest starts, so JAX_PLATFORMS cannot be
overridden here. Instead we rely on the CPU backend initializing lazily:
XLA_FLAGS set below is picked up at the first jax.devices("cpu") call, and we
route all test computation to CPU via jax_default_device (SURVEY.md §4:
multi-chip tests run on a virtual CPU mesh, no real TPUs needed).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

# Force the platform list to cpu-only BEFORE any backend initializes: the
# suite never uses the real chip (virtual 8-device CPU mesh), and without
# this jax.devices("cpu") initializes every registered platform — a flaky
# axon tunnel then fails the whole suite's conftest import.
jax.config.update("jax_platforms", "cpu")

_CPU_DEVICES = jax.devices("cpu")
jax.config.update("jax_default_device", _CPU_DEVICES[0])

REFERENCE_CONTENT = pathlib.Path("/root/reference/content")


@pytest.fixture(scope="session")
def cpu_devices():
    """8 virtual CPU devices for multi-chip sharding tests."""
    return _CPU_DEVICES


@pytest.fixture(scope="session")
def content_dir():
    if not REFERENCE_CONTENT.exists():
        pytest.skip("reference content not available")
    return REFERENCE_CONTENT


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
