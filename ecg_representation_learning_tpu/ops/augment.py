"""Signal augmentations under ``jax.random`` -- trace-safe, batchable.

Reference: ``TimeOut`` (transform.py:175-185): zero out a random contiguous
span whose length is Uniform(lo, hi) fraction of the signal; train-split only
(ptb_dataset.py:147-148).  The torch version mutates one sample at a time on
host; here it is a pure masked multiply over a whole batch on device, with
per-sample spans, so it fuses into the input pipeline.

``RandomCrop`` / ``Resize`` / ``RandomResizedCrop`` are intentionally absent:
the reference stubs them out because stretching breaks ECG morphology
(transform.py:157-172).
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
