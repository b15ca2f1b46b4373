"""Persistent XLA compilation cache for the production entry points.

Round-4 measurement (`benchmarks/EPOCH_DECOMP.json`): the first training
epoch pays a 47-88 s XLA compile wall against 0.3-0.6 s steady-state epochs.
Those programs are identical across invocations (static shapes), so a
persistent on-disk cache collapses the cold start on every run after the
first. bench.py and the benchmark drivers already did this (bench.py:250);
this helper brings the same behavior to the user-facing CLIs
(train/{dcp,rpmnet,fmr}.py, demo.py, register.py).

Cache dir resolution: $JAX_COMPILATION_CACHE_DIR if set, else
~/.cache/arrl_jax (per-user, survives /tmp cleaning). Failures are
non-fatal — a read-only filesystem degrades to cold compiles, never a crash.
"""

from __future__ import annotations

import os


def enable_persistent_cache(min_compile_secs: float = 1.0) -> str | None:
    """Point JAX at a persistent compilation cache directory.

    Call once, before the first jit compilation. Returns the cache dir, or
    None when the cache could not be enabled.
    """
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "arrl_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        return cache_dir
    except Exception:
        return None
