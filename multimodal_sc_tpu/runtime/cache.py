"""Persistent XLA compilation cache.

First compile of the big jitted graphs takes minutes through the TPU
tunnel; the persistent cache makes every later process reuse them. Called
by the CLI, bench, and graft entry points (opt-out via MSC_NO_JAX_CACHE).
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    if os.environ.get("MSC_NO_JAX_CACHE"):
        return
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail the run over it
