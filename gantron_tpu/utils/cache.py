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
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):
        pass  # read-only filesystem or old jax: run without the cache
