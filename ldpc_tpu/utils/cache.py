"""Persistent XLA compilation cache.

First compile of a (code, batch, iterations) shape costs 20-40 s of
host-side XLA work on a fast host -- and minutes on a small one (the decode
kernels unroll per-base-row update chains, so the HLO is large). The
reference pays an analogous one-time cost rebuilding decoder adjacency per
process (python_ldpc_app/main.py:563-567); here the natural fix is JAX's
persistent compilation cache: executables are keyed by (HLO, compile flags,
device topology), so every CLI invocation, bench run, and script after the
first reuses the binary instead of recompiling.

Call :func:`enable_compile_cache` before building executors. It is on by
default in the CLI, bench, and scripts; set ``LDPC_TPU_NO_COMPILE_CACHE=1``
to disable (e.g. when measuring cold-compile time itself).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".xla_cache")


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX at a persistent on-disk compilation cache.

    Returns the cache directory, or None when disabled via
    ``LDPC_TPU_NO_COMPILE_CACHE``. Safe to call more than once."""
    if os.environ.get("LDPC_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = path or os.environ.get("LDPC_TPU_COMPILE_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything: on a 1-core host even "cheap" compiles cost seconds
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
