"""Test harness setup.

The suite runs JAX on a virtual 8-device CPU mesh (multi-chip sharding
tests per SURVEY.md §4).  In this environment a sitecustomize imports jax
at interpreter startup pinned to a single tunneled TPU chip; backend
creation is lazy, so switching the platform + forcing 8 host devices here
(before any jax.devices() call) is sufficient.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

if not os.environ.get("SEEKSV_TPU_TESTS_ON_DEVICE"):  # opt-in to real TPU
    import jax

    jax.config.update("jax_platforms", "cpu")

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
