"""Persistent XLA compilation cache.

TPU compiles of the fused train step / beam search are expensive (minutes
through this environment's remote compile service); the on-disk cache
makes every recompile of an already-seen (program, shape) pair ~10x
faster across processes. Enabled by the CLI, bench, and driver entry
points.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache(cache_dir: str = "jax_cache") -> None:
    global _DONE
    if _DONE:
        return
    import jax

    # respect a cache an embedding process already configured (pytest's
    # conftest points at tests/.jax_test_cache; switching dirs mid-session
    # would turn every later module's warm entries into misses)
    if jax.config.jax_compilation_cache_dir:
        _DONE = True
        return
    path = os.path.abspath(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    _DONE = True
