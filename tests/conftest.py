"""Test configuration.

Device-dependent tests run on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware (the
reference has no distributed tests to mirror - SURVEY.md section 4; this
is the TPU build's added "fake backend").
"""

import os

# Must be set before jax is imported by any test module. The session
# environment may point at a real TPU (JAX_PLATFORMS=axon); tests always
# run on the virtual CPU mesh for determinism and parallel safety.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

REFERENCE_FUNCTIONAL = pathlib.Path("/root/reference/tests/functional")


@pytest.fixture(scope="session")
def golden_dir():
    if not REFERENCE_FUNCTIONAL.exists():
        pytest.skip("reference conformance corpus not available")
    return REFERENCE_FUNCTIONAL
