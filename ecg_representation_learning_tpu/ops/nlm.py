"""1-D non-local-means denoising (Darbon fast algorithm) on TPU.

Reference: ``DataPreprocessor.nlm`` / ``est_noise_std``
(data_preprocessor.py:75-148), itself a port of Zheng's ECGDenoisingTool and
MATLAB ``nlm.m``.  Semantics reproduced exactly, including the quirks recorded
in SURVEY.md:

* search shifts ``idx in [-(sch_wd-1), sch_wd-1]`` with default
  ``sch_wd = len(sig)`` (full O(L^2) search, data_preprocessor.py:98-99);
* per-shift cumulative-SSD windowed distances (Darbon Eq. 3-4);
* smoothing bandwidth ``h = 2 * (2*patch_wd+1) * (scale * sigma_est)^2``
  with the second-difference MAD noise estimate (data_preprocessor.py:75-80);
* the target-index guard ``0 < i+idx < n`` (strictly excludes index 0 --
  a reference quirk kept for parity, data_preprocessor.py:140);
* edge passthrough for the first ``patch_wd+1`` and last ``patch_wd``
  samples (data_preprocessor.py:146-147);
* ``eps`` in the weight normalization (data_preprocessor.py:145).

TPU-native formulation: the inner per-point loop becomes one vectorized pass
over the signal, and the outer shift loop a ``lax.scan`` carrying (numerator,
weight) accumulators -- every scan step is a handful of fused VPU ops over all
(record, lead) lanes at once.  ``sch_wd`` is the perf knob: bounded search
turns the O(L^2) default into O(L * W) without changing per-shift semantics.
"""
from __future__ import annotations

import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def est_noise_std(x: jnp.ndarray) -> jnp.ndarray:
    """Noise-sigma estimate, batched over leading axes.

    Matches ``DataPreprocessor.est_noise_std`` (data_preprocessor.py:75-80)
    *including its in-place update*: the loop writes ``res[i]`` using the
    already-updated ``res[i-1]``, so the semantics are the first-order linear
    recurrence  r[i] = (2 x[i] - x[i+1] - r[i-1]) / sqrt(6)  with r[0] = x[0]
    and r[n-1] = x[n-1] (same in MATLAB DataPreprocessor.m:82-93 -- the 7.4435
    golden value depends on it).  Solved in log-depth with an associative scan
    (r[i] = A r[i-1] + B[i] composes associatively), then
    MAD(1.4826 * (res - median(res))) == 1.4826 * median(|res - median(res)|).
    Returns shape ``x.shape[:-1]``.
    """
    s6 = np.sqrt(6.0)
    n = x.shape[-1]
    a_coef = -1.0 / s6
    # B[i] for interior i in [1, n-2]: (2 x[i] - x[i+1]) / sqrt(6); A = -1/sqrt(6)
    b = (2.0 * x[..., 1:-1] - x[..., 2:]) / s6
    # drive sequence with the seed folded in: Bfull[0] = x[0], so
    # r[j] = sum_m A^m Bfull[j-m] reproduces r[0] = x[0] and the recurrence
    bfull = jnp.concatenate([x[..., :1], b], axis=-1)          # length n-1
    K = 32  # |A|^32 ~ 3.6e-13: truncation far below the rtol=1e-4 contract
    if n - 1 <= K + 2:
        # tiny signals: the log-depth associative scan (exact, cheap here)
        def compose(lhs, rhs):
            (a1, b1), (a2, b2) = lhs, rhs
            return a2 * a1, a2 * b1 + b2
        aa = jnp.concatenate([jnp.zeros_like(x[..., :1]),
                              jnp.full_like(b, a_coef)], axis=-1)
        _, r = jax.lax.associative_scan(compose, (aa, bfull), axis=-1)
    else:
        # The constant-coefficient recurrence r[j] = A r[j-1] + B[j] is a
        # causal filter with geometric kernel A^m -- a K-tap FIR on the MXU
        # (fir_correlate_matmul's framed-Toeplitz matmul) instead of
        # lax.associative_scan, whose log-depth strided lane slices cost
        # ~2.8 ms in the composed denoise chain (round-5 seam probe) vs
        # <0.3 ms here.  Exact to f32 by the decay argument above.
        from .filter import fir_correlate_matmul
        taps = (a_coef ** np.arange(K - 1, -1, -1)).astype(np.float64)
        lead = bfull.shape[:-1]
        xp = jnp.pad(bfull.reshape((-1, n - 1)), ((0, 0), (K - 1, 0)))
        r = fir_correlate_matmul(xp, taps).reshape(lead + (n - 1,))
    res = jnp.concatenate([r, x[..., -1:]], axis=-1)
    assert res.shape[-1] == n
    # bisection-on-counts median (loess.median_last_axis) instead of
    # jnp.median's full XLA sort: the two sort medians were ~5 ms of the
    # 12 ms "NLM" time at (768, 2500) -- the same swap that took rloess
    # from 20.9 to 7.4 ms (round 2).  Exact (element-convergent) medians.
    from .loess import median_last_axis
    med = median_last_axis(res)[..., None]
    return 1.4826 * median_last_axis(jnp.abs(res - med))


def nlm(
    x: jnp.ndarray,
    scale: float = 1.5,
    sch_wd: Optional[int] = None,
    patch_wd: int = 10,
) -> jnp.ndarray:
    """Non-local-means denoise of the last axis, batched over leading axes.

    Parameters mirror the reference (data_preprocessor.py:83-99): ``scale`` the
    Gaussian smoothness factor, ``sch_wd`` the max search distance (None =
    whole signal), ``patch_wd`` the patch half-width.
    """
    n = x.shape[-1]
    if sch_wd is None:
        sch_wd = n
    sch = sch_wd - 1  # reference off-by-one convention (data_preprocessor.py:101)
    shifts = jnp.arange(-sch, sch + 1)

    sigma = est_noise_std(x)
    h = 2.0 * (2 * patch_wd + 1) * (scale * sigma) ** 2  # (...,)
    h = h[..., None]

    i_start, i_end = patch_wd + 1, n - patch_wd
    pos = jnp.arange(n)
    interior = (pos >= i_start) & (pos < i_end)

    def one_shift(carry, s):
        num, z = carry
        # x[k+s] with OOB positions masked to 0
        xs = jnp.roll(x, -s, axis=-1)
        kplus = pos + s
        in_range = (kplus >= 0) & (kplus < n)
        xs = jnp.where(in_range, xs, 0.0)
        ssd = jnp.where(in_range, (x - xs) ** 2, 0.0)
        sdx = jnp.cumsum(ssd, axis=-1)
        # distance_i = sdx[i + patch_wd] - sdx[i - patch_wd - 1]; valid for interior i
        up = jnp.roll(sdx, -patch_wd, axis=-1)
        lo = jnp.roll(sdx, patch_wd + 1, axis=-1)
        dist = up - lo
        w = jnp.exp(-dist / h)
        # reference guard: target index t = i + s must satisfy 0 < t < n
        valid = interior & (kplus > 0) & (kplus < n)
        w = jnp.where(valid, w, 0.0)
        return (num + w * xs, z + w), None

    num0 = jnp.zeros_like(x)
    z0 = jnp.zeros_like(x)
    (num, z), _ = jax.lax.scan(one_shift, (num0, z0), shifts)

    den = num / (z + sys.float_info.epsilon)
    return jnp.where(interior, den, x)
