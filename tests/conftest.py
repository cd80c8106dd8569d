import os

# Multi-chip tests run on a virtual CPU mesh; set up before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import pathlib

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"
EXAMPLE = pathlib.Path("/root/reference/example")


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN


@pytest.fixture(scope="session")
def example_dir():
    if not EXAMPLE.exists():
        pytest.skip("reference example data not available")
    return EXAMPLE
