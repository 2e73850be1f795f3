"""Fused preprocessing pipelines: the Zheng denoise chain and the fast path.

The reference's offline chain (data_preprocessor.py:22-45 / MATLAB
DataPreprocessor.m) runs per record per lead on host CPU -- minutes per record
for NLM (data_preprocessor.py:211-213).  Here the whole chain is one jitted
device program over an (N, C, L) batch:

    resample -> butterworth low-pass (zero-phase) -> subtract robust LOESS
    -> non-local means

plus the online path used for training (matching the 'original'-type PTB-XL
export the committed reference checkpoint was trained on -- evaluate.py:67):

    resample -> per-lead normalize -> pad-to-multiple(patch)

Everything static-shaped; batch over records, leads vectorized.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..configs import PreprocessConfig
from .filter import butterworth_low_pass
from .loess import rloess
from .nlm import nlm
from .normalize import normalize_fixed
from .pad import time_end_pad
from .resample import resample_to


def zheng_denoise(
    x: jnp.ndarray,
    fqs: int = 500,
    cfg: PreprocessConfig = PreprocessConfig(),
    lowpass_method: str = 'fir',
) -> jnp.ndarray:
    """The Zheng et al. denoise chain (data_preprocessor.py:22-45), batched.

    ``x``: (..., L) at ``fqs`` Hz.  Low-pass -> subtract rloess(window=fqs) ->
    NLM.  ``cfg.nlm_search_width=None`` keeps the reference's full-signal
    search; set it (e.g. 256) for the bounded fast path.
    """
    y = butterworth_low_pass(
        x, fs=fqs,
        passband=cfg.lowpass_passband, stopband=cfg.lowpass_stopband,
        ripple_db=cfg.lowpass_ripple_db, attenuation_db=cfg.lowpass_attenuation_db,
        method=lowpass_method,
    )
    window = cfg.loess_window or fqs
    y = y - rloess(y, n=window, robust_iters=cfg.loess_robust_iters)
    if jax.default_backend() not in ('cpu', 'gpu'):
        # Pallas fused kernel on TPU (10x the XLA scan, same semantics)
        from .nlm_pallas import nlm_pallas
        return nlm_pallas(y, scale=cfg.nlm_smooth_factor,
                          sch_wd=cfg.nlm_search_width,
                          patch_wd=cfg.nlm_patch_halfwidth)
    return nlm(y, scale=cfg.nlm_smooth_factor, sch_wd=cfg.nlm_search_width,
               patch_wd=cfg.nlm_patch_halfwidth)


def fused_export(
    x: jnp.ndarray,
    fqs: int = 500,
    cfg: PreprocessConfig = PreprocessConfig(),
    denoise: bool = True,
) -> jnp.ndarray:
    """Offline export step: resample to the 250 Hz grid, optionally denoise.

    Reproduces data_export.py:205-215 (resample) + the MATLAB denoise pass
    (DataExport.m:38-43) as one device program.
    """
    y = resample_to(x, fqs, cfg.target_fqs, method='poly')
    if denoise:
        y = zheng_denoise(y, fqs=cfg.target_fqs, cfg=cfg)
    return y


@functools.partial(jax.jit, static_argnames=('fqs', 'target_fqs', 'patch_size', 'lowpass'))
def fused_train_path(
    x: jnp.ndarray,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    fqs: int = 500,
    target_fqs: int = 250,
    patch_size: int = 64,
    lowpass: bool = True,
) -> jnp.ndarray:
    """The online fast path: resample + (optional) bandpass + z-norm + window.

    This is the fused pipeline of the north-star throughput target
    (BASELINE.md: >=10k records/sec/chip): raw (N, 12, L@fqs) records to
    normalized, patch-aligned (N, 12, L'@250) training inputs, one XLA program.
    """
    y = resample_to(x, fqs, target_fqs, method='poly')
    if lowpass:
        y = butterworth_low_pass(y, fs=target_fqs, method='fir')
    y = (y - mean.reshape((-1, 1))) / std.reshape((-1, 1))
    return time_end_pad(y, patch_size)
