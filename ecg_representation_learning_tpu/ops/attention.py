"""Blockwise (flash-style) multi-head attention as a Pallas TPU kernel.

The reference's attention lives inside the ``vit-pytorch`` dependency
(ecg_vit.py:116); here it is a first-class kernel.  ECG sequences are tiny
(40 patches + cls = 41 tokens, SURVEY.md §2.3), so a single block covers the
whole sequence today -- but the kernel is written blockwise with online
softmax so long-record pretraining (full INCART/MIMIC strips) is a config
change, not a rewrite.

Design:
  * grid = (batch*heads, q_blocks, k_blocks); the k dimension is sequential
    ("arbitrary") with running (max, sum, acc) scratch in VMEM -- the standard
    online-softmax recursion; output written on the last k step.
  * logical head_dim is zero-padded to the 128-lane tile; padded K positions
    are masked to -inf before the softmax, padded V columns produce zeros that
    are sliced off.
  * backward: custom VJP that recomputes the attention probabilities from the
    saved (q, k, v) residuals with plain XLA einsums -- exact (softmax is
    shift-invariant), and at ECG sizes the O(T^2) recompute is negligible; a
    fully-blocked backward kernel is the long-sequence extension point.
  * attention-probability dropout (reference trains with p=0.1,
    ecg_vit.py:113) runs IN-KERNEL: the keep mask is a counter-based hash of
    (seed, batch*head, q position, k position) computed on the VPU, never
    stored -- the backward (XLA recompute or the blocked kernels) regenerates
    the identical mask from the same inputs, so training uses the Pallas
    kernel with dropout active and no T x T mask ever hits HBM.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

def _mxu_precision(dtype):
    """HIGHEST (multi-pass fp32) for f32 kernel inputs -- the Mosaic default
    runs bf16 MXU passes on f32 operands, costing ~1e-2 parity; bf16 inputs
    keep the native fast path."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


# dropout threshold resolution: keep iff low 24 hash bits >= rate * 2^24
_DROPOUT_RES = 1 << 24


def dropout_keep(seed, bh, qpos, kpos, rate: float):
    """Counter-based keep mask for attention-probability dropout.

    A stateless 32-bit mixer (lowbias32-style xor/multiply finalizer) over
    (seed, batch*head index, query position, key position).  Pure jnp integer
    ops, so Pallas (Mosaic) and XLA produce bit-identical masks -- the
    backward pass regenerates the forward's mask instead of storing it.
    ``seed`` must be a non-negative int32/uint32 scalar.
    """
    u32 = jnp.uint32
    h = (jnp.asarray(seed).astype(u32) * u32(0x9E3779B9)
         + jnp.asarray(bh).astype(u32) * u32(0x85EBCA6B)
         + jnp.asarray(qpos).astype(u32) * u32(0xC2B2AE35)
         + jnp.asarray(kpos).astype(u32) * u32(0x27D4EB2F))
    h = h ^ (h >> 16)
    h = h * u32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * u32(0x846CA68B)
    h = h ^ (h >> 16)
    thresh = u32(min(int(round(rate * _DROPOUT_RES)), _DROPOUT_RES - 1))
    return (h & u32(_DROPOUT_RES - 1)) >= thresh


def _attn_reference(q, k, v, scale, mask_len=None):
    """Plain XLA attention (B, H, T, D) -- the fallback/dropout path and the
    golden for kernel tests."""
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, v.dtype.type(scale) * k,
                        preferred_element_type=jnp.float32)
    if mask_len is not None:
        kpos = jnp.arange(q.shape[2])
        logits = jnp.where(kpos[None, None, None, :] < mask_len, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum('bhqk,bhkd->bhqd', probs.astype(v.dtype), v)


def _flash_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale: float, seq_len: int, block_q: int, block_k: int,
                  dropout_rate: float):
    """One (bh, iq, ik) grid step of the online-softmax recursion."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]            # (block_q, D)
    k = k_ref[0]            # (block_k, D)
    v = v_ref[0]

    prec = _mxu_precision(q.dtype)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32) * scale    # (block_q, block_k)

    # mask padded key positions (T padded up to a block multiple)
    kpos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kpos < seq_len, s, NEG_INF)

    m_prev = m_ref[:, :1]                                # (block_q, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                               # (block_q, block_k)
    # the normalizer accumulates RAW p: dropout applies to the normalized
    # softmax probabilities (vit-pytorch semantics), i.e. after the division
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)

    if dropout_rate > 0.0:
        bh = pl.program_id(0)
        qpos = (pl.program_id(1) * block_q
                + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
        keep = dropout_keep(seed_ref[0, 0], bh, qpos, kpos, dropout_rate)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))

    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32)
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0, ...] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def _flash_kernel_lse(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                      m_ref, l_ref, acc_ref,
                      *, scale: float, seq_len: int, block_q: int, block_k: int,
                      dropout_rate: float):
    """Forward variant that also emits the log-sum-exp (for the blocked bwd)."""
    _flash_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  scale=scale, seq_len=seq_len, block_q=block_q,
                  block_k=block_k, dropout_rate=dropout_rate)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == nk - 1)
    def _emit_lse():
        lse_ref[0, ...] = m_ref[...] + jnp.log(jnp.maximum(l_ref[...], 1e-30))


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _padded_qkv(q, k, v, block_q, block_k):
    b, h, t, d = q.shape
    tq = -(-t // block_q) * block_q
    tk = -(-t // block_k) * block_k
    dp = max(128, -(-d // 128) * 128)
    qp = _pad_to(_pad_to(q, tq, 2), dp, 3).reshape(b * h, tq, dp)
    kp = _pad_to(_pad_to(k, tk, 2), dp, 3).reshape(b * h, tk, dp)
    vp = _pad_to(_pad_to(v, tk, 2), dp, 3).reshape(b * h, tk, dp)
    return qp, kp, vp, tq, tk, dp


def _seed_smem(seed):
    """Scalar dropout seed as a (1, 1) int32 for SMEM."""
    return jnp.asarray(seed, jnp.int32).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=('scale', 'block_q', 'block_k',
                                             'interpret', 'return_lse',
                                             'dropout_rate'))
def _flash_forward(q, k, v, seed, scale: float, block_q: int, block_k: int,
                   interpret: bool = False, return_lse: bool = False,
                   dropout_rate: float = 0.0):
    b, h, t, d = q.shape
    qp, kp, vp, tq, tk, dp = _padded_qkv(q, k, v, block_q, block_k)

    grid = (b * h, tq // block_q, tk // block_k)
    in_specs = [
        pl.BlockSpec((1, 1), lambda bh, iq, ik: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, block_q, dp), lambda bh, iq, ik: (bh, iq, 0)),
        pl.BlockSpec((1, block_k, dp), lambda bh, iq, ik: (bh, ik, 0)),
        pl.BlockSpec((1, block_k, dp), lambda bh, iq, ik: (bh, ik, 0)),
    ]
    scratch = [
        pltpu.VMEM((block_q, 128), jnp.float32),   # running max
        pltpu.VMEM((block_q, 128), jnp.float32),   # running sum
        pltpu.VMEM((block_q, dp), jnp.float32),    # output accumulator
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=('parallel', 'parallel', 'arbitrary'))
    o_spec = pl.BlockSpec((1, block_q, dp), lambda bh, iq, ik: (bh, iq, 0))
    kw = dict(scale=scale, seq_len=t, block_q=block_q, block_k=block_k,
              dropout_rate=dropout_rate)
    if return_lse:
        out, lse = pl.pallas_call(
            functools.partial(_flash_kernel_lse, **kw),
            out_shape=(jax.ShapeDtypeStruct((b * h, tq, dp), q.dtype),
                       jax.ShapeDtypeStruct((b * h, tq, 128), jnp.float32)),
            grid=grid, in_specs=in_specs,
            out_specs=(o_spec,
                       pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik: (bh, iq, 0))),
            scratch_shapes=scratch, compiler_params=params,
            interpret=interpret,
        )(_seed_smem(seed), qp, kp, vp)
        return (out.reshape(b, h, tq, dp)[:, :, :t, :d],
                lse[:, :, 0].reshape(b, h, tq)[:, :, :t])
    out = pl.pallas_call(
        functools.partial(_flash_kernel, **kw),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, dp), q.dtype),
        grid=grid, in_specs=in_specs, out_specs=o_spec,
        scratch_shapes=scratch, compiler_params=params,
        interpret=interpret,
    )(_seed_smem(seed), qp, kp, vp)
    return out.reshape(b, h, tq, dp)[:, :, :t, :d]


# ---------------------------------------------------------------------------
# Blocked backward kernels (long-sequence path: never materializes T x T)
# ---------------------------------------------------------------------------
def _bwd_dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, acc_ref, *, scale: float, seq_len: int,
                   block_q: int, block_k: int, dropout_rate: float):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    prec = _mxu_precision(q.dtype)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            precision=prec,
                            preferred_element_type=jnp.float32) * scale
    kpos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kpos < seq_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0][:, :1])
    dpv = jax.lax.dot_general(do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                              precision=prec,
                              preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        # regenerate the forward's mask: dL/dp = keep/(1-rate) * (g . v)
        qpos = (pl.program_id(1) * block_q
                + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
        keep = dropout_keep(seed_ref[0, 0], pl.program_id(0), qpos, kpos,
                            dropout_rate)
        dpv = jnp.where(keep, dpv, 0.0) * (1.0 / (1.0 - dropout_rate))
    ds = p * (dpv - delta_ref[0][:, :1])
    acc_ref[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32) * scale

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0, ...] = acc_ref[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, acc_dk, acc_dv,
                    *, scale: float, seq_len: int, block_q: int, block_k: int,
                    dropout_rate: float):
    iq = pl.program_id(2)
    nq = pl.num_programs(2)
    ik = pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        acc_dk[...] = jnp.zeros_like(acc_dk)
        acc_dv[...] = jnp.zeros_like(acc_dv)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    prec = _mxu_precision(q.dtype)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            precision=prec,
                            preferred_element_type=jnp.float32) * scale
    kpos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    qpos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(kpos < seq_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0][:, :1])
    p = jnp.where(qpos < seq_len, p, 0.0)          # padded queries contribute 0
    dpv = jax.lax.dot_general(do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                              precision=prec,
                              preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        keep = dropout_keep(seed_ref[0, 0], pl.program_id(0), qpos, kpos,
                            dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        # dv flows through the dropped-and-scaled probabilities
        p_eff = jnp.where(keep, p, 0.0) * inv
        dpv = jnp.where(keep, dpv, 0.0) * inv
    else:
        p_eff = p
    acc_dv[...] += jax.lax.dot_general(
        p_eff.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32)
    ds = p * (dpv - delta_ref[0][:, :1])
    acc_dk[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32) * scale

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0, ...] = acc_dk[...].astype(dk_ref.dtype)
        dv_ref[0, ...] = acc_dv[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=('scale', 'block_q', 'block_k',
                                             'interpret', 'dropout_rate'))
def _flash_backward_blocked(q, k, v, out, lse, g, seed, scale: float,
                            block_q: int, block_k: int, interpret: bool = False,
                            dropout_rate: float = 0.0):
    b, h, t, d = q.shape
    qp, kp, vp, tq, tk, dp = _padded_qkv(q, k, v, block_q, block_k)
    dop = _pad_to(_pad_to(g, tq, 2), dp, 3).reshape(b * h, tq, dp)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    lse_p = _pad_to(lse, tq, 2).reshape(b * h, tq, 1)
    lse_p = jnp.broadcast_to(lse_p, (b * h, tq, 128))
    delta_p = _pad_to(delta, tq, 2).reshape(b * h, tq, 1)
    delta_p = jnp.broadcast_to(delta_p, (b * h, tq, 128))
    seed_a = _seed_smem(seed)

    ss = pl.BlockSpec((1, 1), lambda bh, i1, i2: (0, 0), memory_space=pltpu.SMEM)
    qs = pl.BlockSpec((1, block_q, dp), lambda bh, iq, ik: (bh, iq, 0))
    ks = pl.BlockSpec((1, block_k, dp), lambda bh, iq, ik: (bh, ik, 0))
    rs = pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik: (bh, iq, 0))
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, seq_len=t,
                          block_q=block_q, block_k=block_k,
                          dropout_rate=dropout_rate),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, dp), q.dtype),
        grid=(b * h, tq // block_q, tk // block_k),
        in_specs=[ss, qs, ks, ks, qs, rs, rs],
        out_specs=qs,
        scratch_shapes=[pltpu.VMEM((block_q, dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(seed_a, qp, kp, vp, dop, lse_p, delta_p)

    # dk/dv: grid is (bh, k_blocks, q_blocks) with the q axis sequential
    qs2 = pl.BlockSpec((1, block_q, dp), lambda bh, ik, iq: (bh, iq, 0))
    ks2 = pl.BlockSpec((1, block_k, dp), lambda bh, ik, iq: (bh, ik, 0))
    rs2 = pl.BlockSpec((1, block_q, 128), lambda bh, ik, iq: (bh, iq, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, seq_len=t,
                          block_q=block_q, block_k=block_k,
                          dropout_rate=dropout_rate),
        out_shape=(jax.ShapeDtypeStruct((b * h, tk, dp), k.dtype),
                   jax.ShapeDtypeStruct((b * h, tk, dp), v.dtype)),
        grid=(b * h, tk // block_k, tq // block_q),
        in_specs=[ss, qs2, ks2, ks2, qs2, rs2, rs2],
        out_specs=(ks2, ks2),
        scratch_shapes=[pltpu.VMEM((block_k, dp), jnp.float32),
                        pltpu.VMEM((block_k, dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(seed_a, qp, kp, vp, dop, lse_p, delta_p)

    def unpad(x, tt):
        return x.reshape(b, h, tt, dp)[:, :, :t, :d]
    return unpad(dq, tq), unpad(dk, tk), unpad(dv, tk)


# sequence length above which the backward switches from XLA recompute
# (materializes T x T probabilities) to the blocked kernels
BLOCKED_BWD_MIN_SEQ = 1024


def _keep_full(seed, b, h, t, rate: float):
    """(B*H, T, T) keep mask via the same hash the kernels compute on the fly
    (XLA recompute backward + reference/golden paths)."""
    bh = jnp.arange(b * h, dtype=jnp.int32)[:, None, None]
    qpos = jnp.arange(t, dtype=jnp.int32)[None, :, None]
    kpos = jnp.arange(t, dtype=jnp.int32)[None, None, :]
    return dropout_keep(seed, bh, qpos, kpos, rate).reshape(b, h, t, t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def flash_attention(q, k, v, seed=0, scale: Optional[float] = None,
                    block_q: int = 128, block_k: int = 128,
                    interpret: bool = False, dropout_rate: float = 0.0):
    """Multi-head attention, (B, H, T, D) -> (B, H, T, D).

    ``scale`` defaults to 1/sqrt(D).  Forward runs the Pallas kernel,
    including attention-probability dropout when ``dropout_rate`` > 0
    (``seed``: non-negative int32 scalar; the keep mask is hashed from
    (seed, bh, q, k) positions, never stored).  Backward: XLA recompute for
    short sequences (exact, negligible at ECG sizes); the blocked Pallas
    kernels for T >= BLOCKED_BWD_MIN_SEQ, which never materialize the T x T
    probabilities (long-record pretraining).  Both regenerate the identical
    dropout mask.
    """
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    return _flash_forward(q, k, v, seed, scale, block_q, block_k, interpret,
                          dropout_rate=dropout_rate)


def _flash_fwd(q, k, v, seed, scale, block_q, block_k, interpret, dropout_rate):
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    if q.shape[2] >= BLOCKED_BWD_MIN_SEQ:
        out, lse = _flash_forward(q, k, v, seed, scale, block_q, block_k,
                                  interpret, return_lse=True,
                                  dropout_rate=dropout_rate)
        return out, (q, k, v, seed, out, lse)
    out = _flash_forward(q, k, v, seed, scale, block_q, block_k, interpret,
                         dropout_rate=dropout_rate)
    return out, (q, k, v, seed, None, None)


def _flash_bwd(scale, block_q, block_k, interpret, dropout_rate, res, g):
    q, k, v, seed, out, lse = res
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    d_seed = np.zeros((), jax.dtypes.float0)  # integer arg: no gradient
    if lse is not None:
        dq, dk, dv = _flash_backward_blocked(q, k, v, out, lse, g, seed, scale,
                                             block_q, block_k, interpret,
                                             dropout_rate=dropout_rate)
        return dq, dk, dv, d_seed
    # short-sequence path: recompute probabilities exactly in XLA
    b, h, t, _ = q.shape
    prec = _mxu_precision(q.dtype)
    s = jnp.einsum('bhqd,bhkd->bhqk', q, k, precision=prec,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dp = jnp.einsum('bhqd,bhkd->bhqk', g32, v32, precision=prec)
    if dropout_rate > 0.0:
        keep = _keep_full(seed, b, h, t, dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        dv = jnp.einsum('bhqk,bhqd->bhkd',
                        jnp.where(keep, p, 0.0) * inv, g32, precision=prec)
        dp = jnp.where(keep, dp, 0.0) * inv
    else:
        dv = jnp.einsum('bhqk,bhqd->bhkd', p, g32, precision=prec)
    # softmax backward: ds = p * (dp - sum_k p*dp)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.einsum('bhqk,bhkd->bhqd', ds, k.astype(jnp.float32),
                    precision=prec) * scale
    dk = jnp.einsum('bhqk,bhqd->bhkd', ds, q.astype(jnp.float32),
                    precision=prec) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), d_seed


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# --- tensor-parallel kernel wrapping -----------------------------------------
# pallas_call has no GSPMD partitioning rules, so under tensor parallelism the
# kernel must be shard_map-wrapped over the mesh (heads sharded over 'model',
# batch over 'data') -- set by the trainer around model.apply at trace time.
_TP_CTX = None


class flash_tp_context:
    """Trace-time context: route ``attention()`` through a shard_map-wrapped
    flash kernel over ``mesh`` (q/k/v sharded batch-over-``batch_axis``,
    heads-over-``head_axis``).  Megatron activation layout, so the wrap
    inserts no collectives."""

    def __init__(self, mesh, batch_axis: str = 'data', head_axis: str = 'model'):
        self.ctx = (mesh, batch_axis, head_axis)

    def __enter__(self):
        global _TP_CTX
        self._old, _TP_CTX = _TP_CTX, self.ctx
        return self

    def __exit__(self, *exc):
        global _TP_CTX
        _TP_CTX = self._old
        return False


def flash_attention_sharded(q, k, v, mesh, batch_axis: str = 'data',
                            head_axis: str = 'model', seed=0,
                            dropout_rate: float = 0.0, interpret: bool = False,
                            block_q: int = 128, block_k: int = 128):
    """shard_map-wrapped flash kernel: each device runs the Pallas kernel on
    its local (batch shard, head shard); no cross-device communication.
    The dropout seed is folded with the shard coordinates so masks stay
    decorrelated across shards (the in-kernel hash indexes LOCAL bh)."""
    from jax.sharding import PartitionSpec as P

    spec = P(batch_axis, head_axis, None, None)

    def local(qq, kk, vv, sd):
        if dropout_rate > 0.0:
            ib = jax.lax.axis_index(batch_axis)
            ih = jax.lax.axis_index(head_axis)
            shard = ib * jax.lax.axis_size(head_axis) + ih
            sd = (sd + (shard + 1) * jnp.int32(0x3C6EF3)) & jnp.int32(0x7FFFFFFF)
        return flash_attention(qq, kk, vv, sd, None, block_q, block_k,
                               interpret, dropout_rate)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which the vma checker would reject
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(spec, spec, spec, P()), out_specs=spec,
                       check_vma=False)
    return fn(q, k, v, jnp.asarray(seed, jnp.int32))


def attention(q, k, v, dropout_rate: float = 0.0, deterministic: bool = True,
              dropout_rng=None, use_flash: bool = True, interpret: bool = False,
              min_seq: int = 0):
    """Dispatch: Pallas kernel whenever flash is enabled and T >= ``min_seq``
    -- including dropout-active training (in-kernel hashed mask; reference
    semantics: dropout on attention probabilities, ecg_vit.py:113 via
    vit-pytorch) and tensor-parallel runs (shard_map wrap under
    ``flash_tp_context``).  XLA fallback on CPU/GPU, when use_flash=False, or
    below ``min_seq`` (the kernel's 128-padded blocks lose to exact einsums
    at tiny T -- measured in PERF.md)."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    on_tpu = jax.default_backend() not in ('cpu', 'gpu')  # tpu / axon tunnel
    active = (not deterministic) and dropout_rate > 0.0
    if use_flash and q.shape[2] >= min_seq and (on_tpu or interpret):
        if active:
            # 31-bit non-negative seed (int32-safe for SMEM)
            seed = (jax.random.bits(dropout_rng, (), jnp.uint32) >> 1
                    ).astype(jnp.int32)
        else:
            seed = 0
        if _TP_CTX is not None:
            mesh, batch_axis, head_axis = _TP_CTX
            return flash_attention_sharded(
                q, k, v, mesh, batch_axis, head_axis, seed,
                float(dropout_rate) if active else 0.0, interpret)
        if active:
            return flash_attention(q, k, v, seed, None,
                                   128, 128, interpret, float(dropout_rate))
        return flash_attention(q, k, v, 0, None, 128, 128, interpret)
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jnp.asarray(jax.nn.softmax(logits, axis=-1), v.dtype)
    if active:
        # raw-bits compare + multiply, applied AFTER the bf16 cast: no f32
        # uniform conversion and half the elementwise traffic on the (padded)
        # (B,H,T,T) tensor vs bernoulli+where on f32 probs -- measured 7.3 ms
        # of a 62.8 ms ViT-base bs-192 step (PERF.md round 3).  keep-prob is
        # quantized to 1/2^32 (identical in distribution for any real rate).
        bits = jax.random.bits(dropout_rng, probs.shape, jnp.uint32)
        thresh = jnp.uint32(round((1.0 - dropout_rate) * float(0xFFFFFFFF)))
        probs = probs * (bits < thresh).astype(v.dtype) / (1.0 - dropout_rate)
    return jnp.einsum('bhqk,bhkd->bhqd', probs, v)
