"""Persistent XLA compilation cache.

Full-size SDXL programs take minutes to compile (the remote TPU compiler
in this environment makes it worse); the persistent cache makes every
rerun of bench/train/eval warm-start. Safe to call multiple times.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "PSO_COMPILATION_CACHE", os.path.expanduser("~/.cache/pso_jax_comp_cache")
)


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    path = cache_dir or DEFAULT_CACHE_DIR
    if not path:
        return
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
