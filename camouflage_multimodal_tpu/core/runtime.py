"""Runtime/backend knobs shared by every entry point.

The axon-tunneled JAX build on this machine IGNORES the standard
``JAX_COMPILATION_CACHE_DIR`` environment variable (its sitecustomize
initializes the config before user env processing, same way it ignores
``JAX_PLATFORMS``) — ``jax.config.compilation_cache_dir`` stays ``None``
and the persistent compilation cache silently never initializes, so every
process pays the full 20-60 s XLA compile of each pipeline/trainer
program. Calling :func:`enable_persistent_compile_cache` early (before the
first compilation; backend init is fine) restores cross-process caching —
the backend itself reports ``platform == "tpu"`` and supports executable
serialization, so entries round-trip correctly.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = "/tmp/jax_cache"


def enable_persistent_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default
    ``$JAX_COMPILATION_CACHE_DIR`` or ``/tmp/jax_cache``) via the config
    knob, which works where the env var is ignored. Idempotent; returns
    the directory used."""
    import jax

    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _DEFAULT_CACHE_DIR)
    if jax.config.jax_compilation_cache_dir != path:
        jax.config.update("jax_compilation_cache_dir", path)
    # Persist EVERY compile: on this tunneled backend even a bare eager op
    # (jit_multiply, jit_dot_general, …) costs ~0.35 s of server-side
    # compile per process, and a typical entry point touches dozens of
    # distinct eager ops — under the stock 1.0 s (or 0.5 s) threshold none
    # of them are written, so every fresh process pays them all again
    # (~15-30 s of invisible warmup). The entries are tiny; cache them all.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", float(
        os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")))
    return path
