"""Persistent XLA compilation cache.

Full-model compiles of the jitted train step / predict run for minutes on
TPU; with the persistent cache a re-run of the same config reloads in
seconds. Opt-out by pointing JAX_COMPILATION_CACHE_DIR somewhere yourself
(then this helper is a no-op).
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """Short fingerprint of the host CPU's feature set.

    XLA:CPU AOT results embed the *compiling* host's machine features, and
    jax's cache key does not — a cache populated on one machine can feed a
    differently-featured host code that can SIGILL. Salting the cache dir
    with the feature flags keeps each host class in its own namespace. TPU
    executables are host-independent, but the suite and CLIs compile for
    CPU too, so the salt covers both. (Note: jax 0.9.0's cpu_aot_loader
    prints a feature-mismatch warning even for same-host entries because
    XLA appends pseudo-features like +prefer-no-scatter at compile time
    that host detection never reports — that warning is cosmetic and not
    what this salt addresses.)"""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 exposes "flags", aarch64 exposes "Features"
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    ident = f"{platform.machine()}-{platform.processor()}"
    return hashlib.sha1(ident.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX at a persistent on-disk compilation cache. Returns the
    cache dir, or None if configuration failed (old jax, read-only fs)."""
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "maskrcnn_tpu_xla",
        _host_fingerprint(),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        return None
    return path
