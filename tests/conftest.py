"""Test config: force CPU JAX with 8 virtual devices (multi-chip sharding tests run on
a simulated mesh, per SURVEY.md §4's test plan).

The session environment pins JAX_PLATFORMS=axon (TPU) and a sitecustomize imports jax
at interpreter startup, so plain env vars are too late — `jax.config.update` still
works as long as no backend has been initialized yet.
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled-executable state between test modules.

    The full suite accumulates hundreds of XLA:CPU compilations; without this,
    compilation aborts (SIGABRT inside backend_compile_and_load, no XLA error
    text) deterministically near the end of the run (test_tree_spec) while the
    same tests pass in isolation. Per-module cache clearing keeps the peak
    compiler state bounded; within-module recompiles are cheap."""
    yield
    jax.clear_caches()
