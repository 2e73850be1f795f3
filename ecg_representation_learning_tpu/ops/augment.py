"""Signal augmentations under ``jax.random`` -- trace-safe, batchable.

Reference: ``TimeOut`` (transform.py:175-185): zero out a random contiguous
span whose length is Uniform(lo, hi) fraction of the signal; train-split only
(ptb_dataset.py:147-148).  The torch version mutates one sample at a time on
host; here it is a pure masked multiply over a whole batch on device, with
per-sample spans, so it fuses into the input pipeline.

``RandomCrop`` / ``Resize`` / ``RandomResizedCrop`` are intentionally absent:
the reference stubs them out because stretching breaks ECG morphology
(transform.py:157-172).

The contrastive-view family (amplitude scale, additive jitter, lead dropout,
circular time shift + ``timeout``) is likewise morphology-safe: none of the
transforms stretch the waveform, so beat shapes survive every view.  All are
pure batched device ops, so the two-view construction fuses into the jitted
pretrain step (train/contrastive.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def timeout(
    rng: jax.Array,
    x: jnp.ndarray,
    lo: float = 0.0,
    hi: float = 0.5,
) -> jnp.ndarray:
    """Zero a random time span per sample.

    ``x``: (..., C, L) -- the span is shared across leads of one sample
    (matching the reference, which masks ``sig[..., s:e]`` over all leads).
    Leading axes are treated as independent samples.
    """
    length = x.shape[-1]
    batch_shape = x.shape[:-2] if x.ndim >= 2 else ()
    k_frac, k_start = jax.random.split(rng)
    frac = jax.random.uniform(k_frac, batch_shape, minval=lo, maxval=hi)
    span = jnp.round(frac * length).astype(jnp.int32)
    # start uniform in [0, L - span)  (reference: randint(high=L - l_crop))
    u = jax.random.uniform(k_start, batch_shape)
    start = jnp.floor(u * (length - span)).astype(jnp.int32)
    pos = jnp.arange(length)
    # broadcast: (..., 1, L) mask over channels
    start_b = start[..., None, None]
    span_b = span[..., None, None]
    mask = (pos >= start_b) & (pos < start_b + span_b)
    return jnp.where(mask, 0.0, x)


def amplitude_scale(
    rng: jax.Array,
    x: jnp.ndarray,
    lo: float = 0.8,
    hi: float = 1.25,
) -> jnp.ndarray:
    """Multiply each sample by one random gain in [lo, hi].

    Models electrode-contact / gain variation; shared across leads so the
    relative lead amplitudes (diagnostic in ECG) are preserved.
    """
    batch_shape = x.shape[:-2] if x.ndim >= 2 else ()
    gain = jax.random.uniform(rng, batch_shape, minval=lo, maxval=hi)
    return x * gain[..., None, None]


def gaussian_jitter(
    rng: jax.Array,
    x: jnp.ndarray,
    sigma: float = 0.05,
) -> jnp.ndarray:
    """Additive white noise scaled to each sample's own std.

    ``sigma`` is a fraction of the per-sample signal std, so the perturbation
    strength is invariant to normalization scheme / lead gain.
    """
    std = x.std(axis=(-2, -1), keepdims=True)
    noise = jax.random.normal(rng, x.shape, x.dtype)
    return x + noise * (sigma * std)


def channel_dropout(
    rng: jax.Array,
    x: jnp.ndarray,
    rate: float = 0.2,
) -> jnp.ndarray:
    """Zero each lead independently with probability ``rate``, never all 12.

    Mirrors real acquisition dropouts (loose electrode) and the corpus quirk
    the framework already preserves (PTB-XL record 12722's all-zero lead --
    DataExport.m:46-54): the encoder must not depend on any single lead.  A
    sample whose draw would zero every lead keeps them all instead (static
    shapes; no resampling loop).
    """
    keep = jax.random.uniform(rng, x.shape[:-1]) >= rate        # (..., C)
    all_dropped = ~keep.any(axis=-1, keepdims=True)
    keep = keep | all_dropped
    return x * keep[..., None].astype(x.dtype)


def time_shift(
    rng: jax.Array,
    x: jnp.ndarray,
    max_frac: float = 0.5,
) -> jnp.ndarray:
    """Circular roll by a random per-sample offset up to ``max_frac * L``.

    ECG is quasi-periodic, so a circular shift relabels the window phase
    without stretching any beat -- unlike Resize-style transforms the
    reference deliberately refuses (transform.py:157-172).  Implemented as a
    gather with per-sample offsets (one fused take_along_axis, no host loop).
    """
    length = x.shape[-1]
    batch_shape = x.shape[:-2] if x.ndim >= 2 else ()
    max_shift = max(int(round(max_frac * length)), 1)
    shift = jax.random.randint(rng, batch_shape, 0, max_shift)
    pos = jnp.arange(length)
    idx = (pos + shift[..., None]) % length                     # (..., L)
    return jnp.take_along_axis(x, idx[..., None, :], axis=-1)


def contrastive_view(
    rng: jax.Array,
    x: jnp.ndarray,
    *,
    scale_lo: float = 0.8,
    scale_hi: float = 1.25,
    jitter_sigma: float = 0.05,
    lead_dropout: float = 0.2,
    shift_frac: float = 0.5,
    timeout_hi: float = 0.25,
) -> jnp.ndarray:
    """One stochastic view: shift -> scale -> lead dropout -> jitter -> timeout.

    Order matters only in that ``timeout`` runs last so its zero span is not
    re-filled by jitter.  Any stage can be disabled by its zero/degenerate
    value (e.g. ``lead_dropout=0``).
    """
    k_shift, k_scale, k_lead, k_jit, k_to = jax.random.split(rng, 5)
    if shift_frac > 0:
        x = time_shift(k_shift, x, max_frac=shift_frac)
    if scale_lo != 1.0 or scale_hi != 1.0:
        x = amplitude_scale(k_scale, x, lo=scale_lo, hi=scale_hi)
    if lead_dropout > 0:
        x = channel_dropout(k_lead, x, rate=lead_dropout)
    if jitter_sigma > 0:
        x = gaussian_jitter(k_jit, x, sigma=jitter_sigma)
    if timeout_hi > 0:
        x = timeout(k_to, x, lo=0.0, hi=timeout_hi)
    return x
