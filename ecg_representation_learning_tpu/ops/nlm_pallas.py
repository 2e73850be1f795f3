"""Pallas TPU kernel for 1-D non-local means.

Same semantics as :func:`ops.nlm.nlm` (the reference Darbon/Zheng algorithm,
data_preprocessor.py:83-148 -- including the ``0 < i+shift < n`` target guard
and edge passthrough), but fused into one kernel:

  * grid = (row_blocks, shifts); the shift axis is sequential ("arbitrary")
    with (numerator, weight) accumulators living in VMEM scratch for the whole
    sweep -- no HBM round-trips between shifts (the XLA scan version pays
    carry traffic + a log-depth cumsum per shift);
  * the shifted signal x[k+s] is a dynamic slice into a zero-padded copy
    (slice start == shift grid index, so it is trivially in-bounds);
  * the Darbon windowed SSD distance is a (2*patch_wd+1)-tap box sum computed
    with static ``pltpu.roll``s instead of a cumulative sum -- pure VPU adds;
  * weights, accumulation, normalization and edge passthrough all happen
    in-register; the output block is written once on the last shift.

VMEM per block: ~6 * L * block_rows * 4B (x, padded x, 2 accumulators).
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


def _nlm_kernel(x_ref, h_ref, out_ref, num_ref, z_ref,
                *, n_real: int, n_shifts: int, patch_wd: int, lp: int):
    si = pl.program_id(1)
    s = si - (n_shifts - 1) // 2  # shifts are symmetric: [-(S-1), S-1]

    @pl.when(si == 0)
    def _init():
        num_ref[...] = jnp.zeros_like(num_ref)
        z_ref[...] = jnp.zeros_like(z_ref)

    x = x_ref[...]                                   # (BR, Lp)
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    kplus = pos + s
    in_range = (kplus >= 0) & (kplus < n_real)

    # x[k + s] via a dynamic circular rotate; every wrapped lane is exactly
    # where in_range is False, so the mask restores zero-padding semantics
    xs = pltpu.roll(x, (-s) % lp, 1)
    xs = jnp.where(in_range, xs, 0.0)
    ssd = jnp.where(in_range, (x - xs) ** 2, 0.0)
    # padded tail (pos >= n_real) must contribute nothing to the box sum
    ssd = jnp.where(pos < n_real, ssd, 0.0)

    # Darbon windowed distance: (2*patch_wd+1)-tap box sum via a log-tree of
    # static rolls -- doubling partial sums then combining by the binary
    # expansion of the width (7 rolls for 21 taps vs 20 for the naive form;
    # the rolls dominate this VPU kernel).  Interior points never touch the
    # wrap-around because they sit >= patch_wd+1 from either end, and the
    # padded tail is zeroed above.  dist0(i) = sum ssd[i : i+w]; re-centering
    # by +patch_wd makes it the symmetric window around i.
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

    w = jnp.exp(-dist / h_ref[:, :1])
    interior = (pos >= patch_wd + 1) & (pos < n_real - patch_wd)
    valid = interior & (kplus > 0) & (kplus < n_real)
    w = jnp.where(valid, w, 0.0)

    num_ref[...] += w * xs
    z_ref[...] += w

    @pl.when(si == n_shifts - 1)
    def _finalize():
        den = num_ref[...] / (z_ref[...] + _EPS)
        out_ref[...] = jnp.where(interior, den, x)


@functools.partial(jax.jit, static_argnames=('sch_wd', 'patch_wd', 'block_rows',
                                             'interpret'))
def _nlm_pallas_2d(x: jnp.ndarray, h: jnp.ndarray, sch_wd: int, patch_wd: int,
                   block_rows: int = 64, interpret: bool = False) -> jnp.ndarray:
    """x: (R, L) float32 rows; h: (R,) bandwidths."""
    r, n = x.shape
    lp = -(-n // 128) * 128
    rp = -(-r // block_rows) * block_rows
    sch = sch_wd - 1
    n_shifts = 2 * sch + 1

    xp = jnp.pad(x, ((0, rp - r), (0, lp - n)))
    hp = jnp.pad(h, (0, rp - r), constant_values=1.0).reshape(rp, 1)
    hp = jnp.broadcast_to(hp, (rp, 128))  # lane-aligned per-row bandwidth

    kernel = functools.partial(_nlm_kernel, n_real=n, n_shifts=n_shifts,
                               patch_wd=patch_wd, lp=lp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rp, lp), x.dtype),
        grid=(rp // block_rows, n_shifts),
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
