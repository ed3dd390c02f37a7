"""Persistent XLA compilation cache for the user-facing entry points.

Cold compiles of the jitted train/decode programs cost tens of seconds
to minutes (the remat'd train step compiled in 100-770 s during
development benchmarks). JAX's persistent cache replays them from disk:
measured on v5e, the gpt2 train-step startup drops 14.8 s -> 3.3 s on
the second run (results captured 2026-08-17).

Enabled by the CLI (`ergm_tpu.cli.main`); benchmark scripts deliberately
do NOT enable it so their reported compile times stay cold-start
honest. Opt out with ERGM_NO_COMPILE_CACHE=1; point elsewhere with
JAX_COMPILATION_CACHE_DIR (which JAX also honors natively).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache; returns the dir used
    (None when disabled via ERGM_NO_COMPILE_CACHE)."""
    if os.environ.get("ERGM_NO_COMPILE_CACHE", "") not in ("", "0", "false"):
        return None
    import jax

    path = (path
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache", "ergm_tpu", "jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache anything that took meaningful compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    return path
