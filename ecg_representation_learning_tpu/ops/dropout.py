"""Stateless counter-based dropout (``VitConfig.dropout_impl='hash'``).

``hash_dropout`` derives the keep mask from a stateless integer mixer (the
same lowbias32-style hash the flash-attention kernel uses for its in-kernel
dropout, ops/attention.py:52-72) over (seed, site salt, flat element
index), and regenerates the identical mask in the backward via custom_vjp
-- no mask residual, no PRNG-impl dependence.

When to use which (measured, PERF.md round-3 bisect):
  * ``'flax'`` (default): with the production ``prng_impl='rbg'``
    ``nn.Dropout`` is FREE on this chip (fwd+bwd 11.97 ms dropout-on vs
    12.16 ms off) -- the hardware RNG generates masks faster than the
    VPU evaluates the integer hash (32-bit int multiplies are emulated).
  * ``'hash'``: ~2% slower (12.42 ms), but masks are bit-identical across
    backends/platforms/PRNG impls (rbg streams are backend-dependent), and
    it beats flax by ~7 ms/step when threefry reproducibility is required.

Semantics: keep probability quantized to 1/2^24 (indistinguishable from
exact at any real rate); masks are deterministic in (rng, salt, shape) and
independent across sites/layers via the salt and flax's per-site rng
folding.

Reference semantics preserved: dropout sites and rates match vit-pytorch's
(attention probs, attention out, both MLP sites, embedding -- reference
models/ecg_vit.py:95-127 via vit_pytorch.ViT).
"""
from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .attention import dropout_keep


def _masked(x, seed, rate: float, salt: int):
    idx = jax.lax.iota(jnp.int32, x.size).reshape(x.shape)
    keep = dropout_keep(seed, jnp.int32(salt), idx, 0, rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return x * (keep.astype(x.dtype) * scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _hash_mul(x, seed, rate: float, salt: int):
    """Residual-free dropout multiply: the backward regenerates the identical
    mask from the scalar seed (dropout is elementwise-linear in x, so the VJP
    is the same masked multiply applied to the cotangent) instead of saving a
    mask tensor for XLA to schedule."""
    return _masked(x, seed, rate, salt)


def _hash_mul_fwd(x, seed, rate: float, salt: int):
    return _masked(x, seed, rate, salt), seed


def _hash_mul_bwd(rate: float, salt: int, seed, g):
    return _masked(g, seed, rate, salt), np.zeros((), jax.dtypes.float0)


_hash_mul.defvjp(_hash_mul_fwd, _hash_mul_bwd)


def hash_dropout(x, rate: float, rng, salt: int):
    """Dropout via a fuseable counter hash.  ``rng``: a jax PRNG key (only a
    32-bit seed scalar is drawn from it); ``salt``: static per-site constant
    decorrelating sites that share an rng."""
    if rate == 0.0:
        return x
    seed = (jax.random.bits(rng, (), jnp.uint32) >> 1).astype(jnp.int32)
    return _hash_mul(x, seed, rate, salt)


class HashDropout(nn.Module):
    """Drop-in replacement for ``nn.Dropout(rate)(x, deterministic=...)``
    backed by :func:`hash_dropout`.  Draws its seed from the module's
    ``'dropout'`` rng stream, so sites/layers decorrelate exactly the way
    flax's fold-in rules already guarantee."""
    rate: float
    salt: int = 0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        return hash_dropout(x, self.rate, self.make_rng('dropout'), self.salt)
