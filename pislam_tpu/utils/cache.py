"""Persistent XLA compilation cache — one per-user default for the repo.

Every entry point (bench, tools, service, demo, driver hooks) wants the
persistent compilation cache: first compiles of the full pipeline take
minutes, repeats are seconds. The default path is per-user under the system
temp dir (a fixed world-writable /tmp path would let another user pre-create
or poison the cache JAX deserializes executables from, and shared dirs are a
lock-contention surface for concurrent runs — ADVICE.md round 2).

Override with JAX_COMPILATION_CACHE_DIR.
"""

import os
import tempfile


def default_cache_dir() -> str:
    uid = os.getuid() if hasattr(os, "getuid") else "user"
    return os.path.join(tempfile.gettempdir(), f"pislam_jax_cache_{uid}")


def enable_compile_cache() -> str:
    """Set and activate the persistent compilation cache; returns the path.

    Safe to call before or after the first jax import/backend use (the cache
    config is read per-compile, not at import).
    """
    path = os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                                 default_cache_dir())
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
