"""Sampling-rate conversion to the common 250 Hz grid, on device.

The reference resamples every lead with ``wfdb.processing.resample_sig``
(data_export.py:205-215), which is scipy's FFT resampler
(``scipy.signal.resample``); the MATLAB export path uses polyphase
``resample(sig, p, q)`` with a rational ratio from ``rat()``
(DataPreprocessor.m:45-54).  Registry fqs fields imply the ratios
500->250, 1000->250, 257->250 and 400->250.

Two TPU-native paths, both batched over leading (record, lead) axes:

- :func:`resample_fft` -- exact ``scipy.signal.resample`` semantics via
  ``jnp.fft.rfft``/``irfft`` (XLA has fast TPU FFTs).  Golden-parity path for
  the Python export.
- :func:`resample_poly` -- polyphase FIR (scipy ``resample_poly`` / MATLAB
  ``resample`` style): host-designed Kaiser-windowed FIR, applied as one
  dilated/strided convolution that XLA maps onto the MXU.  This is the
  throughput path used by the fused preprocessing pipeline.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resample_fft(x: jnp.ndarray, num: int) -> jnp.ndarray:
    """FFT-based resampling of the last axis to ``num`` samples.

    Matches ``scipy.signal.resample`` for real input (rfft bin copy with the
    even-length Nyquist-bin corrections, irfft back, amplitude rescale).
    """
    n = x.shape[-1]
    if num == n:
        return x
    X = jnp.fft.rfft(x, axis=-1)
    n_keep = min(num, n)
    nyq = n_keep // 2 + 1
    Y = X[..., :nyq]
    if n_keep < n:      # downsampling: fold energy at the new Nyquist bin
        if n_keep % 2 == 0:
            Y = Y.at[..., n_keep // 2].multiply(2.0)
    elif n_keep < num:  # upsampling: split the old Nyquist bin
        if n_keep % 2 == 0:
            Y = Y.at[..., n_keep // 2].multiply(0.5)
    pad = num // 2 + 1 - Y.shape[-1]
    if pad > 0:
        Y = jnp.pad(Y, [(0, 0)] * (Y.ndim - 1) + [(0, pad)])
    y = jnp.fft.irfft(Y, num, axis=-1)
    return y * (num / n)


@functools.lru_cache(maxsize=None)
def _poly_design(up: int, down: int, window_beta: float = 5.0):
    """Host-side polyphase FIR design mirroring scipy.signal.resample_poly."""
    from scipy import signal
    g = math.gcd(up, down)
    up //= g
    down //= g
    if up == down == 1:
        return up, down, None, 0
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = signal.firwin(2 * half_len + 1, f_c, window=('kaiser', window_beta))
    h = h * up

    def output_len(len_h, n_in):
        return (n_in * up + (len_h - 1) + (down - 1)) // down  # upfirdn output length

    n_pre_pad = down - half_len % down
    n_post_pad = 0
    n_pre_remove = (half_len + n_pre_pad) // down
    # n_out for a nominal input length is computed at call time; padding below
    # only needs to guarantee enough taps, computed per call in resample_poly
    return up, down, (h, n_pre_pad, n_pre_remove), half_len


def resample_poly(x: jnp.ndarray, up: int, down: int,
                  window_beta: float = 5.0) -> jnp.ndarray:
    """Polyphase rational resampling of the last axis by up/down.

    Matches ``scipy.signal.resample_poly`` (Kaiser beta=5 default): upsample by
    zero-insertion, FIR low-pass, downsample -- fused into one
    ``lax.conv_general_dilated`` (lhs_dilation=up, stride=down) on the MXU.
    """
    up0, down0, design, half_len = _poly_design(up, down, window_beta)
    if design is None:
        return x
    up, down = up0, down0
    h, n_pre_pad, n_pre_remove = design
    n_in = x.shape[-1]
    n_out = (n_in * up) // down + bool((n_in * up) % down)

    def output_len(len_h):
        return ((n_in - 1) * up + len_h + (down - 1)) // down

    n_post_pad = 0
    while output_len(len(h) + n_pre_pad + n_post_pad) < n_out + n_pre_remove:
        n_post_pad += 1
    hp = np.concatenate([np.zeros(n_pre_pad), h, np.zeros(n_post_pad)])
    K = len(hp)

    if up == 1:
        # pure decimation (e.g. 500->250): framed Toeplitz matmul on the MXU
        # (see ops.filter.fir_correlate_matmul) instead of a feature-dim-1 conv
        from .filter import fir_correlate_matmul
        xpad = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(K - 1, K - 1)])
        y = fir_correlate_matmul(xpad, hp[::-1].copy(), stride=down)
        return y[..., n_pre_remove:n_pre_remove + n_out]

    lead_shape = x.shape[:-1]
    flat = x.reshape((-1, 1, n_in))
    kern = jnp.asarray(hp[::-1].copy(), x.dtype).reshape((1, 1, K))
    # upfirdn: zero-stuff by `up` (lhs_dilation), full convolution (pad K-1),
    # then keep every `down`-th sample (stride)
    y = jax.lax.conv_general_dilated(
        flat, kern,
        window_strides=(down,),
        padding=[(K - 1, K - 1)],
        lhs_dilation=(up,),
        dimension_numbers=('NCH', 'OIH', 'NCH'),
        precision=jax.lax.Precision.HIGHEST,  # DSP parity: no bf16 MXU passes
    )
    y = y.reshape(lead_shape + (y.shape[-1],))
    return y[..., n_pre_remove:n_pre_remove + n_out]


def resample_to(x: jnp.ndarray, fqs: int, target_fqs: int = 250,
                method: str = 'fft') -> jnp.ndarray:
    """Resample the last axis from ``fqs`` Hz to ``target_fqs`` Hz.

    'fft' matches the reference Python export (wfdb resample_sig,
    data_export.py:205-215); 'poly' matches the MATLAB export
    (DataPreprocessor.m:45-54) and is the fast path.
    """
    if fqs == target_fqs:
        return x
    if method == 'fft':
        num = int(x.shape[-1] * target_fqs / fqs)
        return resample_fft(x, num)
    g = math.gcd(target_fqs, fqs)
    return resample_poly(x, target_fqs // g, fqs // g)
