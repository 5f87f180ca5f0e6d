"""Persistent XLA compilation cache for benchmark/bench entry points.

Large fused programs (the PPO update, the 1M-env episode kernels) take
minutes to compile through the remote-compile path on the axon TPU backend;
the benchmark scripts share most shapes, so a persistent on-disk cache turns
every run after the first into a cache hit. Failures to serialize (some
experimental backends can't) are non-fatal by JAX default.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_persistent_compile_cache(path: str = None) -> str:
    """Idempotently point JAX at an on-disk compilation cache; returns the
    directory. Override with OGT_COMPILE_CACHE (empty string disables)."""
    global _ENABLED
    import jax

    env = os.environ.get("OGT_COMPILE_CACHE")
    if env == "":
        return ""
    path = env or path or os.path.expanduser("~/.cache/ogt_jax_cache")
    if _ENABLED:
        return path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took noticeable compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _ENABLED = True
    return path
