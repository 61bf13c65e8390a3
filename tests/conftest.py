"""Test configuration.

Tests run on CPU with 8 virtual devices (the shard_map/mesh analog of the
reference CI's 1-vs-2-thread determinism legs, ``.github/workflows/CI.yml``)
and with x64 enabled so f32 results can be validated against f64 ground
truth, mirroring the reference tests' Float32-vs-Float64 sweeps.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU: the ambient environment may pin JAX_PLATFORMS to a TPU platform,
# but unit tests validate numerics on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# jax may already have been imported by a pytest plugin, after which the
# JAX_PLATFORMS env var is no longer consulted — set the config directly
# (legal as long as no backend has been initialized yet).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache for the suite: compiled CPU executables are
# reused across the per-module jax.clear_caches() below AND across suite
# runs (the in-memory caches are dropped but the on-disk cache survives),
# cutting most of the recompile cost the segfault workaround introduced.
# Keyed by jaxlib version + flags, so stale entries are never reused.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("PATHFINDER_TEST_CACHE", "/tmp/jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    With the full suite in one process (~400 compiled programs), jaxlib's
    CPU compiler eventually segfaults inside backend_compile — observed
    deterministically around the 150th test regardless of which test runs
    there (raising the stack rlimit does not help, and any subset of the
    suite passes). Dropping the pjit/executable caches between modules
    keeps the compiler's accumulated state bounded; per-module recompiles
    are the (small) price, mostly paid back by the persistent compile
    cache configured above. A standalone repro was attempted
    (``benchmarks/repro_jaxlib_segfault.py``: 500 scan+cholesky programs
    compile fine), so the trigger is specific to the suite's large
    programs; set ``PATHFINDER_KEEP_JAX_CACHES=1`` to disable this
    workaround when re-testing on a newer jaxlib.
    """
    yield
    if not os.environ.get("PATHFINDER_KEEP_JAX_CACHES"):
        jax.clear_caches()
