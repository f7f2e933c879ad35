"""Test config: run everything on a virtual 8-device CPU mesh.

This is the TPU-world fake backend the reference lacks (SURVEY.md §4):
sharding/collective logic is exercised on N simulated host devices via
XLA's forced host platform, so multi-chip code paths are tested without
hardware. Must run before jax is imported anywhere.
"""

import os
import sys

# NOTE: this image preimports jax via a sitecustomize before conftest runs,
# so plain env vars are too late for the platform choice; use config.update.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("DCA_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


@pytest.fixture(scope="session")
def reference_path():
    """Path to the upstream reference checkout (oracle for parity tests)."""
    if not reference_available():
        pytest.skip("reference checkout not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # the reference targets numpy<1.24; restore removed aliases it uses
    for name, alias in (("int", int), ("bool", bool), ("float", float)):
        if not hasattr(np, name):
            setattr(np, name, alias)
    return REFERENCE_ROOT


@pytest.fixture
def rng():
    return np.random.RandomState(0)
