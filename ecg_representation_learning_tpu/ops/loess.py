"""Robust LOESS (local quadratic regression) baseline-wander removal on TPU.

The reference subtracts a robust LOESS smooth with a window of ``fqs`` points
(data_preprocessor.py:44, 60-73, via the ``loess`` package; MATLAB twin uses
``smooth(sig, fqs, 'rloess')``, DataPreprocessor.m:73-80).  Note the reference
itself only matches MATLAB to ``atol=10`` (data_preprocessor.py:196), so the
contract here is classic robust LOESS semantics (Cleveland 1979 / MATLAB
'rloess'): tricube distance weights, local quadratic fit over the ``n``
nearest points, and bisquare robustifying iterations against the global MAD of
residuals.

TPU-native formulation (no per-point Python loops, everything batched over
(record, lead) axes):

* Interior points have a fixed symmetric window, so the weighted-least-squares
  normal equations reduce to eight moment sums
  ``S_k(i) = sum_u K(u) u^k r_{i+u}`` and ``T_k(i) = sum_u K(u) u^k r_{i+u} y_{i+u}``
  -- plain FIR correlations of the robust weights ``r`` (and ``r*y``) with the
  fixed kernels ``K(u) u^k``.  One grouped convolution computes all eight
  channels; XLA lowers it onto the MXU.  The per-point quadratic solve is a
  closed-form 3x3 Cramer solve in registers (VPU).
* Edge points (first/last ``half`` samples) use shifted windows; they are
  handled with one small dense einsum over precomputed (edge-point, window)
  weight tensors.
* Robust iterations rebuild bisquare weights from residuals (global per-lead
  MAD, ``jnp.median`` on device) and repeat -- default 5 iterations as MATLAB.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _force_odd(n: int) -> int:
    """MATLAB-compatible odd forcing (reference data_preprocessor.py:15-16)."""
    return 2 * (n // 2) + 1


@functools.lru_cache(maxsize=None)
def _interior_kernels(n: int) -> np.ndarray:
    """(5, n) kernels K(u) * u^k, k=0..4, u normalized to [-1, 1]."""
    half = (n - 1) // 2
    u = np.arange(-half, half + 1) / half  # normalized offsets
    tricube = (1.0 - np.abs(u) ** 3) ** 3
    tricube = np.maximum(tricube, 0.0)
    return np.stack([tricube * u ** k for k in range(5)]).astype(np.float64)


@functools.lru_cache(maxsize=None)
def _edge_geometry(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """For the ``half`` left-edge points: tricube weights and offsets.

    Returns (W, U): W[i, j] tricube weight of window point j for edge point i,
    U[i, j] normalized offset (x_j - x_i)/d_max.  The window for every edge
    point is the first n samples; d_max = max distance within it (MATLAB
    nearest-n semantics on a uniform grid).  Right edges mirror.
    """
    half = (n - 1) // 2
    i = np.arange(half)[:, None]          # edge point index
    j = np.arange(n)[None, :]             # window position
    d = j - i
    dmax = np.maximum(i, n - 1 - i)       # max |d| in window
    u = d / dmax
    w = np.maximum(1.0 - np.abs(u) ** 3, 0.0) ** 3
    return w.astype(np.float64), u.astype(np.float64)


def _interior_smooth(y: jnp.ndarray, rw: jnp.ndarray, n: int,
                     eps: float = 1e-7) -> jnp.ndarray:
    """LOESS values for interior points i in [half, L-half).

    y, rw: (..., L).  Returns (..., L - 2*half).

    The eight moment sums are correlations against fixed kernels over the
    same window; one multi-output framed-Toeplitz matmul computes all of
    them on the MXU (ops.filter.fir_correlate_matmul_multi) -- the
    feature-dim-1 conv alternative runs ~100x slower on the VPU.  (Odd-power
    kernels enter with either sign convention: mirroring u -> -u leaves the
    fitted intercept beta0 unchanged.)
    """
    from .filter import fir_correlate_matmul_multi
    half = (n - 1) // 2
    kerns = _interior_kernels(n)  # (5, n)
    lead_shape = y.shape[:-1]
    L = y.shape[-1]
    flat_rw = rw.reshape((-1, L))
    flat_ry = (rw * y).reshape((-1, L))
    # two separate framed matmuls (S: 5 kernels on rw, T: 3 on rw*y); a
    # batch-stacked single call was tried in round 5 and measured ~0.8 ms
    # SLOWER over the whole chain (the 2B-row matmul pipelines worse with
    # its neighbors and pays two dead output channels on the ry half)
    S = fir_correlate_matmul_multi(flat_rw, kerns)        # (B, n_out, 5)
    T = fir_correlate_matmul_multi(flat_ry, kerns[:3])    # (B, n_out, 3)
    s0, s1, s2, s3, s4 = [S[..., k] for k in range(5)]
    t0, t1, t2 = [T[..., k] for k in range(3)]
    # Cramer's rule for [[s0,s1,s2],[s1,s2,s3],[s2,s3,s4]] beta = [t0,t1,t2]
    s0 = s0 + eps
    s2r = s2 + eps
    s4r = s4 + eps
    det = (s0 * (s2r * s4r - s3 * s3)
           - s1 * (s1 * s4r - s3 * s2)
           + s2 * (s1 * s3 - s2r * s2))
    det0 = (t0 * (s2r * s4r - s3 * s3)
            - s1 * (t1 * s4r - s3 * t2)
            + s2 * (t1 * s3 - s2r * t2))
    beta0 = det0 / jnp.where(jnp.abs(det) < eps, eps, det)
    return beta0.reshape(lead_shape + (beta0.shape[-1],))


def _edge_smooth(y_win: jnp.ndarray, rw_win: jnp.ndarray, n: int,
                 flip: bool, eps: float = 1e-7) -> jnp.ndarray:
    """LOESS values for the ``half`` points at one edge.

    y_win, rw_win: (..., n) -- the first (or last) n samples.  flip=True for
    the right edge (geometry mirrors).  Returns (..., half).
    """
    w_np, u_np = _edge_geometry(n)
    if flip:
        w_np, u_np = w_np[:, ::-1], -u_np[:, ::-1]
    dt = y_win.dtype
    w = jnp.asarray(w_np, dt)   # (half, n)
    u = jnp.asarray(u_np, dt)
    wt = w[None] * rw_win[..., None, :]  # (..., half, n) total weights
    # moments: S_k = sum_j wt * u^k ; T_k = sum_j wt * u^k * y
    uk = jnp.stack([u ** k for k in range(5)])        # (5, half, n)
    S = jnp.einsum('...hj,khj->k...h', wt, uk)         # (5, ..., half)
    T = jnp.einsum('...hj,khj,...j->k...h', wt, uk[:3], y_win)
    s0, s1, s2, s3, s4 = S[0] + eps, S[1], S[2] + eps, S[3], S[4] + eps
    t0, t1, t2 = T
    det = (s0 * (s2 * s4 - s3 * s3)
           - s1 * (s1 * s4 - s3 * S[2])
           + S[2] * (s1 * s3 - s2 * S[2]))
    det0 = (t0 * (s2 * s4 - s3 * s3)
            - s1 * (t1 * s4 - s3 * t2)
            + S[2] * (t1 * s3 - s2 * t2))
    beta0 = det0 / jnp.where(jnp.abs(det) < eps, eps, det)
    if flip:
        beta0 = beta0[..., ::-1]
    return beta0


def _smooth_once(y: jnp.ndarray, rw: jnp.ndarray, n: int) -> jnp.ndarray:
    half = (n - 1) // 2
    mid = _interior_smooth(y, rw, n)
    left = _edge_smooth(y[..., :n], rw[..., :n], n, flip=False)
    right = _edge_smooth(y[..., -n:], rw[..., -n:], n, flip=True)
    return jnp.concatenate([left, mid, right], axis=-1)


def median_last_axis(r: jnp.ndarray, iters: int = 40) -> jnp.ndarray:
    """Exact median over the last axis via UNROLLED bisection on counts.

    ``jnp.median`` lowers to a full XLA sort -- measured ~1.5 ms per call on
    (768, 2500) f32, and the robust-LOESS loop makes 2 calls x 5 iterations.
    A sort is wasted work for one order statistic: bisect the value range
    instead, counting ``r <= mid`` per row (compare + row-sum, fully
    vectorized on the VPU).  ``hi`` converges onto the k-th smallest
    *element value*: 40 halvings put it within a few ulps of the data scale
    (usually exactly equal -- the f32 midpoint rounds onto the element);
    even lengths average the two middle elements.

    The 40 halvings are a PYTHON loop (straight-line dataflow), not
    ``lax.fori_loop``: on this platform each while-loop iteration pays
    launch overhead that dominates the ~10 us of actual work per step --
    the round-4 fori version measured 1.21 ms for the dependent med->MAD
    pair vs **0.28 ms unrolled** (bit-identical mid sequence; round-5
    variant shootout, which also rejected a fan-out multi-threshold design
    at 1.57 ms and ``jnp.median``'s sort at 2.10 ms).
    """
    length = r.shape[-1]

    def kth(k):  # smallest t with count(r <= t) >= k, k is 1-based
        lo, hi = jnp.min(r, axis=-1), jnp.max(r, axis=-1)
        for _ in range(iters):
            mid = 0.5 * (lo + hi)
            ge = jnp.sum(r <= mid[..., None], axis=-1) >= k
            lo, hi = jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)
        return hi

    if length % 2:
        return kth(length // 2 + 1)
    return 0.5 * (kth(length // 2) + kth(length // 2 + 1))


def rloess(y: jnp.ndarray, n: int, robust_iters: int = 5) -> jnp.ndarray:
    """Robust LOESS smooth of the last axis with an ``n``-point window.

    Semantics of the reference ``DataPreprocessor.rloess`` (quadratic, window
    forced odd, data_preprocessor.py:60-73) with MATLAB 'rloess' bisquare
    robustification.  Returns the smoothed signal (the caller subtracts it).
    """
    n = _force_odd(min(n, y.shape[-1]))
    if n > y.shape[-1]:
        n -= 2  # forced-odd may overshoot an even-length signal
    if n < 5:
        return y
    rw = jnp.ones_like(y)
    yhat = _smooth_once(y, rw, n)
    for _ in range(robust_iters):
        r = y - yhat
        med = median_last_axis(r)[..., None]
        mad = median_last_axis(jnp.abs(r - med))[..., None]
        scale = 6.0 * mad + 1e-12
        t = jnp.clip(jnp.abs(r) / scale, 0.0, 1.0)
        rw = (1.0 - t * t) ** 2
        yhat = _smooth_once(y, rw, n)
    return yhat


def remove_baseline(y: jnp.ndarray, fqs: int = 500, robust_iters: int = 5) -> jnp.ndarray:
    """``sig - rloess(sig, n=fqs)`` -- the baseline-wander removal step of the
    Zheng chain (data_preprocessor.py:44)."""
    return y - rloess(y, n=fqs, robust_iters=robust_iters)
