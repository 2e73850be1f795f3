"""Pallas TPU kernel for 1-D non-local means.

Same semantics as :func:`ops.nlm.nlm` (the reference Darbon/Zheng algorithm,
data_preprocessor.py:83-148 -- including the ``0 < i+shift < n`` target guard
and edge passthrough), but fused into one kernel:

  * grid = (row_blocks, shift_magnitudes); the shift axis is sequential
    ("arbitrary") with (numerator, weight) accumulators living in VMEM scratch
    for the whole sweep -- no HBM round-trips between shifts (the XLA scan
    version pays carry traffic + a log-depth cumsum per shift);
  * **+-s symmetry (round 4)**: the Darbon distances obey the exact identity
    ``d_{-s}[i] = d_s[i - s]`` (substitute i' = i - s in the windowed SSD), so
    each grid step processes the PAIR {+s, -s}: one SSD, one box-sum tree and
    one exp serve both directions; the -s contribution is two rolls of the +s
    weight field (``w[i-s]``) and signal (``x[i-s]``).  This halves the
    dominant per-shift VPU work with zero accuracy change (measured ~1.7x);
  * the shifted signal x[k+s] is a dynamic circular rotate into a zero-padded
    copy; with s >= 0 only, the single suffix mask ``pos + s < n`` restores
    zero-padding semantics (negative shifts needed a prefix mask too);
  * the Darbon windowed SSD distance is a (2*patch_wd+1)-tap box sum computed
    with static ``pltpu.roll``s instead of a cumulative sum -- pure VPU adds;
  * weights, accumulation, normalization and edge passthrough all happen
    in-register; the output block is written once on the last shift.

VMEM per block: ~6 * L * block_rows * 4B (x, padded x, 2 accumulators).

Padding invariant: the lane-padded length satisfies ``lp >= n + patch_wd`` so
the mirror path's box windows at left-edge positions wrap into *zeroed* pad
lanes (the identity above needs ssd[k'] == 0 for k' < 0; the wrap maps those
to lanes >= n, which the suffix mask zeroes).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nlm import est_noise_std

_EPS = float(np.finfo(np.float64).eps)  # sys.float_info.epsilon parity


def _nlm_kernel(x_ref, hinv_ref, out_ref, num_ref, z_ref,
                *, n_real: int, n_pairs: int, patch_wd: int, lp: int):
    s = pl.program_id(1)          # shift MAGNITUDE; the pair {+s, -s}

    @pl.when(s == 0)
    def _init():
        num_ref[...] = jnp.zeros_like(num_ref)
        z_ref[...] = jnp.zeros_like(z_ref)

    x = x_ref[...]                                   # (BR, Lp)
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)

    # x[k + s] via a dynamic circular rotate.  s >= 0, so the only invalid
    # lanes are the suffix pos + s >= n (covers both the k+s out-of-range
    # guard and the padded tail pos >= n, since s >= 0) -- one mask where the
    # two-sided shift needed three.
    valid_tail = (pos + s) < n_real
    xs = pltpu.roll(x, (-s) % lp, 1)
    ssd = jnp.where(valid_tail, (x - xs) ** 2, 0.0)

    # Darbon windowed distance: (2*patch_wd+1)-tap box sum via a log-tree of
    # static rolls -- doubling partial sums then combining by the binary
    # expansion of the width (7 rolls for 21 taps vs 20 for the naive form;
    # the rolls dominate this VPU kernel).  dist0(i) = sum ssd[i : i+w];
    # re-centering by +patch_wd makes it the symmetric window around i.
    # Wrapped taps land in lanes >= n (zeroed above) because lp >= n+patch_wd.
    w_taps = 2 * patch_wd + 1
    sums = {1: ssd}
    width = 1
    while width * 2 <= w_taps:
        sums[width * 2] = sums[width] + pltpu.roll(sums[width], -width % lp, 1)
        width *= 2
    dist0 = None
    offset = 0
    for p in sorted(sums, reverse=True):
        if w_taps - offset >= p:
            term = (sums[p] if offset == 0
                    else pltpu.roll(sums[p], -offset % lp, 1))
            dist0 = term if dist0 is None else dist0 + term
            offset += p
    dist = pltpu.roll(dist0, patch_wd, 1)

    w = jnp.exp(-dist * hinv_ref[:, :1])             # unmasked weight field
    interior = (pos >= patch_wd + 1) & (pos < n_real - patch_wd)

    # +s direction: guard 0 < k+s < n; k+s > 0 is automatic (interior => k>=1)
    wp = jnp.where(interior & valid_tail, w, 0.0)
    num_ref[...] += wp * xs
    z_ref[...] += wp

    @pl.when(s > 0)
    def _mirror():
        # -s direction via the identity d_{-s}[i] = d_s[i-s]: the weight
        # field and source signal are +s-rolls of what we already have.
        # Guard 0 < k-s (strict, reference data_preprocessor.py:140);
        # k-s < n is automatic.  The rolled-in wrap lanes are masked by it.
        wm = pltpu.roll(w, s, 1)                     # w[i-s]
        xm = pltpu.roll(x, s, 1)                     # x[i-s]
        wmv = jnp.where(interior & (pos - s > 0), wm, 0.0)
        num_ref[...] += wmv * xm
        z_ref[...] += wmv

    @pl.when(s == n_pairs - 1)
    def _finalize():
        den = num_ref[...] / (z_ref[...] + _EPS)
        out_ref[...] = jnp.where(interior, den, x)


@functools.partial(jax.jit, static_argnames=('sch_wd', 'patch_wd', 'block_rows',
                                             'interpret'))
def _nlm_pallas_2d(x: jnp.ndarray, h: jnp.ndarray, sch_wd: int, patch_wd: int,
                   block_rows: int = 64, interpret: bool = False) -> jnp.ndarray:
    """x: (R, L) float32 rows; h: (R,) bandwidths."""
    r, n = x.shape
    # lp >= n + patch_wd: the mirror path's left-edge box windows must wrap
    # into zeroed pad lanes (see module docstring padding invariant)
    lp = -(-(n + patch_wd) // 128) * 128
    rp = -(-r // block_rows) * block_rows
    n_pairs = sch_wd            # magnitudes 0 .. sch_wd-1

    xp = jnp.pad(x, ((0, rp - r), (0, lp - n)))
    hinv = 1.0 / h              # kernel multiplies instead of dividing
    hp = jnp.pad(hinv, (0, rp - r), constant_values=1.0).reshape(rp, 1)
    hp = jnp.broadcast_to(hp, (rp, 128))  # lane-aligned per-row bandwidth

    kernel = functools.partial(_nlm_kernel, n_real=n, n_pairs=n_pairs,
                               patch_wd=patch_wd, lp=lp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rp, lp), x.dtype),
        grid=(rp // block_rows, n_pairs),
        in_specs=[
            pl.BlockSpec((block_rows, lp), lambda rb, si: (rb, 0)),
            pl.BlockSpec((block_rows, 128), lambda rb, si: (rb, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, lp), lambda rb, si: (rb, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_rows, lp), jnp.float32),
            pltpu.VMEM((block_rows, lp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary'),
        ),
        interpret=interpret,
    )(xp, hp)
    return out[:r, :n]


def nlm_pallas(
    x: jnp.ndarray,
    scale: float = 1.5,
    sch_wd: Optional[int] = None,
    patch_wd: int = 10,
    block_rows: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fast path for :func:`ops.nlm.nlm` (same signature + semantics)."""
    n = x.shape[-1]
    if sch_wd is None:
        sch_wd = n
    sigma = est_noise_std(x)
    h = 2.0 * (2 * patch_wd + 1) * (scale * sigma) ** 2
    lead_shape = x.shape[:-1]
    x2 = x.reshape(-1, n).astype(jnp.float32)
    h2 = h.reshape(-1).astype(jnp.float32)
    out = _nlm_pallas_2d(x2, h2, int(sch_wd), int(patch_wd),
                         block_rows=block_rows, interpret=interpret)
    return out.reshape(lead_shape + (n,))
