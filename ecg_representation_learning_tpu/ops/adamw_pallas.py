"""AdamW parameter update as a Pallas TPU kernel (one streaming pass).

The optimizer is pure HBM streaming: per leaf it must read (g, mu, nu, p)
and write (mu', nu', p') -- 2.4 GB logical for ViT-base.  This kernel
streams each leaf once through VMEM with ``input_output_aliases`` pinning
mu/nu/p in place (cost-analysis: 1.3 GB with aliasing).

Measured outcome (PERF.md round 3): 4.18 ms vs 4.03-4.17 ms for the
FusedAdamW XLA lowering -- i.e. XLA's multi-output elementwise fusion was
already at the practical HBM floor (~580 GB/s effective on this chip's
update mix), so the kernel is OFF by default (``use_pallas=False``).  It
remains the floor-proof, the regression baseline for optimizer-layout
experiments, and the fast path if a future param layout defeats XLA's
fusion.

Scope: f32 leaves whose trailing flat size is a multiple of 128 lanes run
through the kernel (every ViT leaf except the 71-wide head bias); the rest
fall back to the identical jnp expression.  ``train/optim.py:FusedAdamW``
dispatches here on TPU backends.

Math (bit-for-bit the FusedAdamW jnp path):
    g'  = where(finite, g * scale, 0)
    mu' = b1*mu + (1-b1)*g'
    nu' = b2*nu + (1-b2)*g'^2
    p'  = p - lr * ((mu'/bc1) / (sqrt(nu'/bc2) + eps) + wd*p)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 256           # x BLOCK_COLS(<=512) f32: 512 KB x 7 refs < VMEM
BLOCK_COLS = 512


def _kernel(s_ref, g_ref, mu_ref, nu_ref, p_ref, mu_o, nu_o, p_o,
            *, b1: float, b2: float, eps: float, wd: float):
    scale = s_ref[0, 0]
    lr = s_ref[0, 1]
    bc1 = s_ref[0, 2]
    bc2 = s_ref[0, 3]
    finite = s_ref[0, 4]
    # select, NOT multiply: a non-finite step must zero g (NaN * 0 == NaN)
    g = jnp.where(finite > 0, g_ref[...] * scale, 0.0)
    mu2 = b1 * mu_ref[...] + (1.0 - b1) * g
    nu2 = b2 * nu_ref[...] + (1.0 - b2) * (g * g)
    upd = (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps)
    p = p_ref[...]
    if wd:
        upd = upd + wd * p
    mu_o[...] = mu2
    nu_o[...] = nu2
    p_o[...] = p - lr * upd


@functools.partial(jax.jit, static_argnames=('b1', 'b2', 'eps', 'wd',
                                             'interpret'))
def adamw_update_leaf(g, mu, nu, p, scalars, *, b1: float, b2: float,
                      eps: float, wd: float, interpret: bool = False):
    """One fused AdamW update for a single f32 leaf.

    ``scalars``: (1, 5) f32 [scale, lr, bc1, bc2, finite] (SMEM).  The leaf
    is viewed as (prod(leading dims), last_dim) -- collapsing LEADING dims
    keeps the tiled TPU layout (an earlier (size//128, 128) flat view forced
    a real relayout copy per operand: 12 GB of traffic instead of 2.4 --
    PERF.md).  Caller guarantees shape[-1] % 128 == 0.
    Returns (mu', nu', p') with mu/nu/p aliased in place.
    """
    shape = p.shape
    cols = shape[-1] if len(shape) > 1 else p.size
    rows = p.size // cols
    view = lambda a: a.reshape(rows, cols)
    bc = min(cols, BLOCK_COLS)
    br = min(rows, BLOCK_ROWS)
    grid = (pl.cdiv(rows, br), pl.cdiv(cols, bc))
    spec = pl.BlockSpec((br, bc), lambda i, j: (i, j))
    out = pl.pallas_call(
        functools.partial(_kernel, b1=b1, b2=b2, eps=eps, wd=wd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 5), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            spec, spec, spec, spec,
        ],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, cols), jnp.float32)] * 3,
        input_output_aliases={2: 0, 3: 1, 4: 2},  # mu, nu, p in place
        interpret=interpret,
    )(scalars, view(g), view(mu), view(nu), view(p))
    return tuple(o.reshape(shape) for o in out)


def leaf_eligible(g, mu, nu, p) -> bool:
    """Kernel path: all-f32 leaf whose LAST dim (or, for 1-D leaves, total
    size) is a lane multiple -- the 2-D view then collapses only leading
    dims, which preserves the tiled layout (no relayout copies)."""
    cols = p.shape[-1] if p.ndim > 1 else p.size
    return (cols % LANES == 0
            and all(a.dtype == jnp.float32 for a in (g, mu, nu, p)))
