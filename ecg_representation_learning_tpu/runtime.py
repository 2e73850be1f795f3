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
    """Turn on the persistent compilation cache (idempotent).

    Skipped on the CPU backend: XLA:CPU executables reloaded from the cache
    (the AOT path) mis-key collective rendezvous -- every collective gets
    ``op_id=1``, so on a multi-device host mesh one device's all-reduce and
    the others' collective-permute wait on each other until the 40 s
    termination timeout calls ``abort()`` (rendezvous.cc:127; reproduced with
    the ring-attention program on the 8-device virtual mesh).  CPU compiles
    are cheap anyway -- the cache exists for the remote-compile TPU tunnel,
    where it turns 70 s compiles into 0.9 s loads.
    """
    import jax
    if jax.default_backend() == 'cpu':
        return ''
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
