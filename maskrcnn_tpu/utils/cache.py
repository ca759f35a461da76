"""Persistent XLA compilation cache.

Full-model compiles of the jitted train step / predict run for minutes on
TPU; with the persistent cache a re-run of the same config reloads in
seconds. Opt-out by pointing JAX_COMPILATION_CACHE_DIR somewhere yourself
(then this helper is a no-op).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX at a persistent on-disk compilation cache. Returns the
    cache dir, or None if configuration failed (old jax, read-only fs)."""
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "maskrcnn_tpu_xla"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        return None
    return path
