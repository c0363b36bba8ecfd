"""Test config: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4).

IMPORTANT: in this image `JAX_PLATFORMS=cpu` is silently IGNORED (the axon
TPU plugin wins); only JAX_PLATFORM_NAME or jax.config force the CPU
backend. Tests must never touch the real chip — concurrent access to the
single tunneled TPU serializes and can hang for minutes.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import gc

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Full-suite runs (200+ jit compiles in one process) started
    segfaulting inside the XLA *CPU* compiler at a fixed point in the
    sequence (backend_compile_and_load, reproducibly at
    test_refraction::test_eta_one_glass_is_invisible) while every
    module passes in isolation — accumulated in-process compiler state,
    not any single test. Dropping compiled-program caches between
    modules bounds that state; the cost is recompiling helpers shared
    across modules, which the suite barely does."""
    yield
    jax.clear_caches()
    gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
