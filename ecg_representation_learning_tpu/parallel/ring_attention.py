"""Ring attention: context parallelism over the sequence axis.

The parity models need none of this (41 tokens, SURVEY.md §2.3), but the build
plan requires attention to scale to long-record pretraining (full INCART /
MIMIC strips) by sharding the sequence over the mesh -- "a config change, not
a rewrite".  This module supplies that config change:

  * each device holds one sequence shard of Q, K, V;
  * K/V blocks rotate around the ring via ``jax.lax.ppermute`` while the local
    Q accumulates blockwise online-softmax statistics (the same recursion as
    the Pallas flash kernel, ops/attention.py) -- compute and communication
    overlap naturally since XLA pipelines the permute with the matmuls;
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


def _ring_attention_local(q, k, v, axis_name: str, scale: float):
    """Per-shard body: q, k, v are (B, H, T_local, D) local blocks."""
    n_dev = jax.lax.axis_size(axis_name)
    b, h, t, d = q.shape
    # mark the initial accumulators as device-varying so the scan carry type
    # matches the ppermute outputs (shard_map vma rules)
    def _vary(x):
        pcast = getattr(jax.lax, 'pcast', None)
        if pcast is not None:
            return pcast(x, axis_name, to='varying')
        return jax.lax.pvary(x, axis_name)

    m0 = _vary(jnp.full((b, h, t, 1), NEG_INF, jnp.float32))
    l0 = _vary(jnp.zeros((b, h, t, 1), jnp.float32))
    acc0 = _vary(jnp.zeros((b, h, t, d), jnp.float32))
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

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

    _, _, _, l, acc = jax.lax.fori_loop(0, n_dev, body, (k, v, m0, l0, acc0))
    return (acc / l).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mesh: Mesh, seq_axis: str = 'data',
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Full (non-causal) attention with the sequence sharded over ``seq_axis``.

    q, k, v: (B, H, T, D) global arrays (T divisible by the axis size).
    Returns (B, H, T, D) with the same sharding.
    """
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    spec = P(None, None, seq_axis, None)
    fn = jax.shard_map(
        functools.partial(_ring_attention_local, axis_name=seq_axis, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)
