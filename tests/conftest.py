"""Test harness config: 8 virtual CPU devices for real sharding semantics.

SURVEY.md §4: distributed tests run on a faked 8-device CPU mesh via
--xla_force_host_platform_device_count (standard JAX trick) so `psum` /
sharding behavior is exercised without TPU hardware. Pallas kernels run in
interpret mode on CPU; set E2E_ASR_TPU_TESTS=1 to run the suite against the
real TPU backend instead.
"""

import os

if not os.environ.get("E2E_ASR_TPU_TESTS"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent XLA:CPU executable cache: every solver instance re-jits the
    # same HLO (new closures), and repeat suite runs recompile everything —
    # both hit this cache instead (measured ~2x suite speedup warm)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), ".jax_test_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
else:  # pragma: no cover
    import jax  # noqa: F401

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    A full-suite run accumulates hundreds of XLA:CPU (LLVM-JIT) executables;
    past ~90 tests the next compile aborts/segfaults inside
    backend_compile_and_load in this jaxlib. Releasing the in-memory cache
    between modules keeps the JIT state bounded (within-module caching, the
    part that matters for speed, is unaffected)."""
    yield
    jax.clear_caches()
