"""Runtime setup helpers: compilation cache, platform selection.

On this class of deployment (tunneled TPU with a remote-compile service),
every jit compile costs 20-70 s of round-trip; JAX's persistent compilation
cache eliminates repeat compiles across processes (measured: 70 s -> 0.9 s).
Call :func:`enable_compilation_cache` early -- the CLI, bench.py and the
driver entry do.
"""
from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache(cache_dir: Optional[str] = None,
                             min_compile_secs: float = 0.5) -> str:
    """Turn on the persistent compilation cache (idempotent)."""
    import jax
    cache_dir = (cache_dir
                 or os.environ.get('ECG_TPU_JAX_CACHE')
                 or os.path.expanduser('~/.cache/ecg_tpu_jax'))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          min_compile_secs)
    except Exception:
        pass  # older jax without the knobs: cache is an optimization only
    return cache_dir


def force_platform(platform: Optional[str]) -> None:
    """Force a JAX backend, overriding site config (which beats env vars)."""
    if not platform:
        return
    import jax
    try:
        jax.config.update('jax_platforms', platform)
    except Exception:
        pass
