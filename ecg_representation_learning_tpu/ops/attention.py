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
    ecg_vit.py:113) is applied by the caller on the XLA path; the kernel path
    is used when dropout is off (eval / deterministic) -- see models/vit.py.
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale: float, seq_len: int, block_k: int):
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

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # (block_q, block_k)

    # mask padded key positions (T padded up to a block multiple)
    kpos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kpos < seq_len, s, NEG_INF)

    m_prev = m_ref[:, :1]                                # (block_q, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                               # (block_q, block_k)
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)

    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0, ...] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def _flash_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
                      *, scale: float, seq_len: int, block_k: int):
    """Forward variant that also emits the log-sum-exp (for the blocked bwd)."""
    _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  scale=scale, seq_len=seq_len, block_k=block_k)
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


@functools.partial(jax.jit, static_argnames=('scale', 'block_q', 'block_k',
                                             'interpret', 'return_lse'))
def _flash_forward(q, k, v, scale: float, block_q: int, block_k: int,
                   interpret: bool = False, return_lse: bool = False):
    b, h, t, d = q.shape
    qp, kp, vp, tq, tk, dp = _padded_qkv(q, k, v, block_q, block_k)

    grid = (b * h, tq // block_q, tk // block_k)
    in_specs = [
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
    if return_lse:
        kernel = functools.partial(_flash_kernel_lse, scale=scale, seq_len=t,
                                   block_k=block_k)
        out, lse = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((b * h, tq, dp), q.dtype),
                       jax.ShapeDtypeStruct((b * h, tq, 128), jnp.float32)),
            grid=grid, in_specs=in_specs,
            out_specs=(o_spec,
                       pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik: (bh, iq, 0))),
            scratch_shapes=scratch, compiler_params=params,
            interpret=interpret,
        )(qp, kp, vp)
        return (out.reshape(b, h, tq, dp)[:, :, :t, :d],
                lse[:, :, 0].reshape(b, h, tq)[:, :, :t])
    kernel = functools.partial(_flash_kernel, scale=scale, seq_len=t, block_k=block_k)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, tq, dp), q.dtype),
        grid=grid, in_specs=in_specs, out_specs=o_spec,
        scratch_shapes=scratch, compiler_params=params,
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, tq, dp)[:, :, :t, :d]


# ---------------------------------------------------------------------------
# Blocked backward kernels (long-sequence path: never materializes T x T)
# ---------------------------------------------------------------------------
def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   acc_ref, *, scale: float, seq_len: int, block_k: int):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    kpos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kpos < seq_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0][:, :1])
    dpv = jax.lax.dot_general(do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds = p * (dpv - delta_ref[0][:, :1])
    acc_ref[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0, ...] = acc_ref[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, acc_dk, acc_dv,
                    *, scale: float, seq_len: int, block_q: int, block_k: int):
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
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    kpos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    qpos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(kpos < seq_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0][:, :1])
    p = jnp.where(qpos < seq_len, p, 0.0)          # padded queries contribute 0
    acc_dv[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpv = jax.lax.dot_general(do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds = p * (dpv - delta_ref[0][:, :1])
    acc_dk[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0, ...] = acc_dk[...].astype(dk_ref.dtype)
        dv_ref[0, ...] = acc_dv[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=('scale', 'block_q', 'block_k',
                                             'interpret'))
def _flash_backward_blocked(q, k, v, out, lse, g, scale: float,
                            block_q: int, block_k: int, interpret: bool = False):
    b, h, t, d = q.shape
    qp, kp, vp, tq, tk, dp = _padded_qkv(q, k, v, block_q, block_k)
    dop = _pad_to(_pad_to(g, tq, 2), dp, 3).reshape(b * h, tq, dp)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    lse_p = _pad_to(lse, tq, 2).reshape(b * h, tq, 1)
    lse_p = jnp.broadcast_to(lse_p, (b * h, tq, 128))
    delta_p = _pad_to(delta, tq, 2).reshape(b * h, tq, 1)
    delta_p = jnp.broadcast_to(delta_p, (b * h, tq, 128))

    qs = pl.BlockSpec((1, block_q, dp), lambda bh, iq, ik: (bh, iq, 0))
    ks = pl.BlockSpec((1, block_k, dp), lambda bh, iq, ik: (bh, ik, 0))
    rs = pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik: (bh, iq, 0))
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, seq_len=t, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, dp), q.dtype),
        grid=(b * h, tq // block_q, tk // block_k),
        in_specs=[qs, ks, ks, qs, rs, rs],
        out_specs=qs,
        scratch_shapes=[pltpu.VMEM((block_q, dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(qp, kp, vp, dop, lse_p, delta_p)

    # dk/dv: grid is (bh, k_blocks, q_blocks) with the q axis sequential
    qs2 = pl.BlockSpec((1, block_q, dp), lambda bh, ik, iq: (bh, iq, 0))
    ks2 = pl.BlockSpec((1, block_k, dp), lambda bh, ik, iq: (bh, ik, 0))
    rs2 = pl.BlockSpec((1, block_q, 128), lambda bh, ik, iq: (bh, iq, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, seq_len=t,
                          block_q=block_q, block_k=block_k),
        out_shape=(jax.ShapeDtypeStruct((b * h, tk, dp), k.dtype),
                   jax.ShapeDtypeStruct((b * h, tk, dp), v.dtype)),
        grid=(b * h, tk // block_k, tq // block_q),
        in_specs=[qs2, ks2, ks2, qs2, rs2, rs2],
        out_specs=(ks2, ks2),
        scratch_shapes=[pltpu.VMEM((block_k, dp), jnp.float32),
                        pltpu.VMEM((block_k, dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(qp, kp, vp, dop, lse_p, delta_p)

    def unpad(x, tt):
        return x.reshape(b, h, tt, dp)[:, :, :t, :d]
    return unpad(dq, tq), unpad(dk, tk), unpad(dv, tk)


# sequence length above which the backward switches from XLA recompute
# (materializes T x T probabilities) to the blocked kernels
BLOCKED_BWD_MIN_SEQ = 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, scale: Optional[float] = None,
                    block_q: int = 128, block_k: int = 128,
                    interpret: bool = False):
    """Multi-head attention, (B, H, T, D) -> (B, H, T, D).

    ``scale`` defaults to 1/sqrt(D).  Forward runs the Pallas kernel.
    Backward: XLA recompute for short sequences (exact, negligible at ECG
    sizes); the blocked Pallas kernels for T >= BLOCKED_BWD_MIN_SEQ, which
    never materialize the T x T probabilities (long-record pretraining).
    """
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    return _flash_forward(q, k, v, scale, block_q, block_k, interpret)


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    if q.shape[2] >= BLOCKED_BWD_MIN_SEQ:
        out, lse = _flash_forward(q, k, v, scale, block_q, block_k, interpret,
                                  return_lse=True)
        return out, (q, k, v, out, lse)
    out = _flash_forward(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, None, None)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, out, lse = res
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    if lse is not None:
        return _flash_backward_blocked(q, k, v, out, lse, g, scale,
                                       block_q, block_k, interpret)
    # short-sequence path: recompute probabilities exactly in XLA
    s = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum('bhqk,bhqd->bhkd', p, g32)
    dp = jnp.einsum('bhqd,bhkd->bhqk', g32, v32)
    # softmax backward: ds = p * (dp - sum_k p*dp)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.einsum('bhqk,bhkd->bhqd', ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum('bhqk,bhqd->bhkd', ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def attention(q, k, v, dropout_rate: float = 0.0, deterministic: bool = True,
              dropout_rng=None, use_flash: bool = True, interpret: bool = False):
    """Dispatch: Pallas kernel when dropout is inactive, XLA path otherwise
    (the reference applies dropout to attention probabilities, vit-pytorch
    semantics via ecg_vit.py:113)."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    on_tpu = jax.default_backend() not in ('cpu', 'gpu')  # tpu / axon tunnel
    if use_flash and (deterministic or dropout_rate == 0.0) and (on_tpu or interpret):
        return flash_attention(q, k, v, None, 128, 128, interpret)
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum('bhqk,bhkd->bhqd', probs.astype(v.dtype), v)
