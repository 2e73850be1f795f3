"""Mixture-of-Experts MLP for the ViT blocks (Switch-Transformer routing).

Expert parallelism (EP) for the 1-D ECG ViT: every ``moe_every``-th block
replaces its dense MLP with ``moe_num_experts`` expert FFNs behind a learned
top-1 router.  TPU-first formulation:

  * routing/dispatch is DENSE linear algebra -- a (S, E, C) one-hot
    dispatch/combine tensor turns the ragged token->expert assignment into
    three einsums that run on the MXU with fully static shapes (no
    data-dependent gathers, no host control flow);
  * fixed per-expert capacity ``C = ceil(capacity_factor * S / E)``: overflow
    tokens are dropped (their block reduces to the residual connection),
    which keeps every shape static under jit -- the standard Switch design;
  * expert weights are stacked ``(E, d, f)`` and sharded over the 'model'
    mesh axis (parallel/mesh.py rules), so EP rides the same mesh as tensor
    parallelism: GSPMD turns the dispatch einsum into the expert all-to-all
    over ICI;
  * the router computes in float32 (softmax stability) regardless of the
    activation dtype; the Switch load-balance auxiliary loss is sown into the
    'moe' collection -- trainers fetch it with ``mutable=['moe']`` and add
    ``moe_aux_weight`` times it to the objective (models/moe.py:moe_aux_loss).

The reference has no MoE (its largest model is a 300 M dense ViT,
ecg_vit.py:87-91); this is a scale-out capability of the TPU rebuild, letting
parameter count grow ~E-fold at constant per-token FLOPs.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..configs import VitConfig


class MoeMlp(nn.Module):
    """Drop-in replacement for the dense ``Mlp`` inside a transformer block."""
    cfg: VitConfig

    @nn.compact
    def __call__(self, x, deterministic: bool):
        from .vit import _dropout, _dtype   # local: avoid an import cycle
        cfg = self.cfg
        e = cfg.moe_num_experts
        b, t, d = x.shape
        s = b * t
        f = cfg.intermediate_size
        dt = _dtype(cfg)
        xs = x.reshape(s, d)

        # --- router (float32) -------------------------------------------------
        router = nn.Dense(e, use_bias=False, dtype=jnp.float32, name='router')
        probs = jax.nn.softmax(router(xs.astype(jnp.float32)), axis=-1)  # (S,E)
        gate = probs.max(axis=-1)                                        # (S,)
        expert = probs.argmax(axis=-1)                                   # (S,)
        onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)            # (S,E)

        # Switch load-balance loss: E * sum_e(frac_tokens_e * mean_prob_e);
        # 1.0 at a perfectly uniform router, grows as routing collapses
        frac = onehot.mean(axis=0)
        mean_prob = probs.mean(axis=0)
        self.sow('moe', 'aux_loss', e * jnp.sum(frac * mean_prob),
                 reduce_fn=lambda a, b: a + b, init_fn=lambda: jnp.float32(0))

        # --- capacity + dispatch/combine tensors ------------------------------
        # ceil(cf * S / E), static, computed EXACTLY: Fraction(repr(cf)) is
        # the decimal the user wrote (repr = shortest round-tripping decimal),
        # so 1.1*100/10 ceils to 11, never 12 (float artifact) and never 10
        # (an eps/round hack could round down past an integer and silently
        # drop tokens -- under-allocation is the worse failure direction)
        import math
        from fractions import Fraction
        cap = max(1, math.ceil(
            Fraction(repr(float(cfg.moe_capacity_factor))) * s / e))
        # position of each token within its expert's buffer (0-based)
        pos = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot                # (S,E)
        pos_in_expert = pos.sum(axis=-1)                                 # (S,)
        keep = (pos_in_expert < cap).astype(jnp.float32)
        dispatch = onehot * keep[:, None]                                # (S,E)
        pos_oh = jax.nn.one_hot(pos_in_expert.astype(jnp.int32), cap,
                                dtype=jnp.float32)                       # (S,C)
        dm = (dispatch[:, :, None] * pos_oh[:, None, :]).astype(dt)      # (S,E,C)

        # --- expert FFNs (stacked weights; EP shards the leading E axis) ------
        w1 = self.param('w1', nn.initializers.lecun_normal(), (e, d, f))
        b1 = self.param('b1', nn.initializers.zeros, (e, f))
        w2 = self.param('w2', nn.initializers.lecun_normal(), (e, f, d))
        b2 = self.param('b2', nn.initializers.zeros, (e, d))
        xe = jnp.einsum('sec,sd->ecd', dm, xs.astype(dt))                # (E,C,d)
        h = jnp.einsum('ecd,edf->ecf', xe, w1.astype(dt)) + b1[:, None, :].astype(dt)
        h = nn.gelu(h, approximate=False)
        h = _dropout(cfg, cfg.hidden_dropout_prob, salt=6)(h, deterministic=deterministic)
        ye = jnp.einsum('ecf,efd->ecd', h, w2.astype(dt)) + b2[:, None, :].astype(dt)

        # --- combine: gate-weighted scatter back; dropped tokens -> 0 ---------
        combine = dm * gate.astype(dt)[:, None, None]                    # (S,E,C)
        ys = jnp.einsum('sec,ecd->sd', combine, ye)
        ys = _dropout(cfg, cfg.hidden_dropout_prob, salt=7)(
            ys, deterministic=deterministic)
        return ys.reshape(b, t, d)


def moe_aux_loss(variables) -> jnp.ndarray:
    """Mean Switch load-balance loss over the model's MoE blocks, from the
    'moe' collection returned by ``model.apply(..., mutable=['moe'])``.
    Returns 0.0 for models without MoE blocks."""
    col = (variables or {}).get('moe', {})
    leaves = jax.tree.leaves(col)
    if not leaves:
        return jnp.float32(0)
    return sum(leaves) / len(leaves)


def apply_with_moe(model, params, *args, moe: bool, mutable_extra=(),
                   **kwargs):
    """``model.apply`` that also returns the scaled-ready MoE aux loss.

    ``moe=False`` (dense model): plain apply, aux = 0 -- zero overhead and no
    change to the traced program.  ``moe=True``: requests the 'moe' collection
    and reduces it.  Trainers add ``cfg.moe_aux_weight * aux`` to their task
    loss so the router stays load-balanced.
    """
    if not moe:
        return model.apply(params, *args, **kwargs), jnp.float32(0)
    out, variables = model.apply(params, *args,
                                 mutable=['moe', *mutable_extra], **kwargs)
    return out, moe_aux_loss(variables)
