"""Persistent XLA compilation cache.

The full-size train step takes minutes to compile; enabling JAX's persistent
cache makes every subsequent process start near-instant (verified working
through the axon remote-compile path). Called by the CLIs and bench/rtf
harnesses before any jit executes.
"""

import os

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str = None):
    cache_dir = cache_dir or os.environ.get("GANTRON_JAX_CACHE",
                                            DEFAULT_CACHE_DIR)
    # Multi-process runs share ONE directory deliberately: JAX's persistent
    # cache writes entries via temp-file + atomic rename, so concurrent
    # writers are safe, and a shared cache keeps every process's compile
    # time symmetric. Per-process directories (an earlier design) are a
    # trap: once one process's cache is warm and another's is cold, the warm
    # one reaches the first cross-process collective minutes early and the
    # Gloo/ICI transport times out waiting for the cold one — and the cold
    # cache never heals because the cluster dies before its compile
    # finishes. See tests/test_multihost.py.
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):
        pass  # read-only filesystem or old jax: run without the cache
