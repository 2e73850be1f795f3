"""Ring attention: context parallelism over the sequence axis, fwd + bwd.

The parity models need none of this (41 tokens, SURVEY.md §2.3), but the build
plan requires attention to scale to long-record pretraining (full INCART /
MIMIC strips) by sharding the sequence over the mesh -- "a config change, not
a rewrite".  This module supplies that config change:

  * each device holds one sequence shard of Q, K, V;
  * forward: K/V blocks rotate around the ring via ``jax.lax.ppermute`` while
    the local Q accumulates blockwise online-softmax statistics (the same
    recursion as the Pallas flash kernel, ops/attention.py) -- compute and
    communication overlap naturally since XLA pipelines the permute with the
    matmuls;
  * backward (custom VJP -- the fori_loop forward is not reverse-
    differentiable, so the gradient ring is written by hand): dQ accumulates
    locally from the saved (q, out, lse) residuals while each K/V block
    travels the ring once more WITH its dK/dV accumulators, so K/V gradients
    arrive home after n steps with contributions from every query shard;
  * expressed with ``shard_map`` over the mesh, so it composes with the
    data/tensor parallelism of mesh.py (sequence can ride any free axis).

Pure-JAX collectives (no Pallas) so it runs identically on the virtual CPU
mesh used by the test suite and on ICI on hardware.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _vary(x, axis_name):
    """Mark a freshly-created array as device-varying so scan/loop carry types
    match the ppermute outputs (shard_map vma rules)."""
    pcast = getattr(jax.lax, 'pcast', None)
    if pcast is not None:
        return pcast(x, axis_name, to='varying')
    return jax.lax.pvary(x, axis_name)


def _ring_perm(axis_name: str):
    n = jax.lax.axis_size(axis_name)
    return n, [(i, (i + 1) % n) for i in range(n)]


def _ring_forward_pass(q, k, v, axis_name: str, scale: float):
    """Per-shard forward: returns (out, lse) with lse = m + log(l)."""
    n_dev, perm = _ring_perm(axis_name)
    b, h, t, d = q.shape
    m0 = _vary(jnp.full((b, h, t, 1), NEG_INF, jnp.float32), axis_name)
    l0 = _vary(jnp.zeros((b, h, t, 1), jnp.float32), axis_name)
    acc0 = _vary(jnp.zeros((b, h, t, d), jnp.float32), axis_name)

    def body(_, carry):
        k_cur, v_cur, m, l, acc = carry
        s = jnp.einsum('bhqd,bhkd->bhqk', q, k_cur,
                       preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = alpha * l + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum('bhqk,bhkd->bhqd', p.astype(v_cur.dtype),
                                       v_cur).astype(jnp.float32)
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return k_next, v_next, m_new, l, acc

    _, _, m, l, acc = jax.lax.fori_loop(0, n_dev, body, (k, v, m0, l0, acc0))
    out = (acc / l).astype(q.dtype)
    lse = m + jnp.log(jnp.maximum(l, 1e-30))       # (B, H, T, 1)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ring_local(q, k, v, axis_name: str, scale: float):
    out, _ = _ring_forward_pass(q, k, v, axis_name, scale)
    return out


def _ring_local_fwd(q, k, v, axis_name, scale):
    out, lse = _ring_forward_pass(q, k, v, axis_name, scale)
    return out, (q, k, v, out, lse)


def _ring_local_bwd(axis_name, scale, res, g):
    """Gradient ring: one more lap.  Per step, the local query shard adds its
    contribution to the visiting K/V block's accumulators (which travel with
    the block), and accumulates its own dQ -- the flash backward recursion
    distributed over the ring."""
    q, k, v, out, lse = res
    n_dev, perm = _ring_perm(axis_name)
    g32 = g.astype(jnp.float32)
    q32 = q.astype(jnp.float32)
    delta = jnp.sum(g32 * out.astype(jnp.float32), axis=-1, keepdims=True)
    dq0 = _vary(jnp.zeros(q.shape, jnp.float32), axis_name)
    dk0 = _vary(jnp.zeros(k.shape, jnp.float32), axis_name)
    dv0 = _vary(jnp.zeros(v.shape, jnp.float32), axis_name)

    def body(_, carry):
        k_cur, v_cur, dk_cur, dv_cur, dq = carry
        s = jnp.einsum('bhqd,bhkd->bhqk', q, k_cur,
                       preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)                              # normalized probs
        dpv = jnp.einsum('bhqd,bhkd->bhqk', g32, v_cur.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        ds = p * (dpv - delta)
        dq = dq + jnp.einsum('bhqk,bhkd->bhqd', ds, k_cur.astype(jnp.float32),
                             preferred_element_type=jnp.float32) * scale
        dk_cur = dk_cur + jnp.einsum('bhqk,bhqd->bhkd', ds, q32,
                                     preferred_element_type=jnp.float32) * scale
        dv_cur = dv_cur + jnp.einsum('bhqk,bhqd->bhkd', p, g32,
                                     preferred_element_type=jnp.float32)
        k_cur, v_cur, dk_cur, dv_cur = (
            jax.lax.ppermute(x, axis_name, perm)
            for x in (k_cur, v_cur, dk_cur, dv_cur))
        return k_cur, v_cur, dk_cur, dv_cur, dq

    _, _, dk, dv, dq = jax.lax.fori_loop(
        0, n_dev, body, (k, v, dk0, dv0, dq0))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring_local.defvjp(_ring_local_fwd, _ring_local_bwd)


def ring_attention_local(q, k, v, axis_name: str,
                         scale: Optional[float] = None) -> jnp.ndarray:
    """Per-shard ring attention for use INSIDE an existing shard_map /
    ``axis_name`` context (e.g. a fully shard_map'd train step).
    Differentiable."""
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    return _ring_local(q, k, v, axis_name, scale)


def ring_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mesh: Mesh, seq_axis: str = 'data',
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Full (non-causal) attention with the sequence sharded over ``seq_axis``.

    q, k, v: (B, H, T, D) global arrays (T divisible by the axis size).
    Returns (B, H, T, D) with the same sharding.  Differentiable: the custom
    VJP rings K/V gradient accumulators around the mesh.
    """
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    spec = P(None, None, seq_axis, None)
    fn = jax.shard_map(
        functools.partial(ring_attention_local, axis_name=seq_axis, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)
