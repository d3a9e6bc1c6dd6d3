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
        # Multi-process runs compile the same programs concurrently; give
        # each process its own directory so cache writes never race.
        # (process_count touches the backend — callers run after
        # jax.distributed.initialize, see train.py.)
        if jax.process_count() > 1:
            cache_dir = os.path.join(cache_dir, f"proc{jax.process_index()}")
    except Exception:
        pass
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):
        pass  # read-only filesystem or old jax: run without the cache
