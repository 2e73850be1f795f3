"""1-D Vision Transformer for 12-lead ECG, in flax.linen.

Capability parity with the reference ``EcgVit`` (models/ecg_vit.py:95-149,
which wraps ``vit_pytorch.ViT`` with image_size=(1, L), patch_size=(1, 64),
cls pooling): patch embedding over (12 x 64)-sample patches, learned position
embeddings, cls token, pre-norm transformer blocks, BCE-with-logits multi-label
head with optional per-label loss weighting (ecg_vit.py:144-148), and the
debug/tiny/small/base/large ladder via ``VitConfig.from_defined``.

TPU-native choices: bfloat16 activations with float32 LayerNorm/softmax/loss,
the blockwise Pallas attention kernel (ops/attention.py) on both the eval and
the dropout-active training paths (in-kernel hashed dropout mask) FOR
SEQUENCES >= ``VitConfig.flash_min_seq`` (default 128) -- below that XLA
attention measures faster (PERF.md "Flash attention: kernel-vs-XLA
crossover"), so the PTB-XL parity models (T=41) deliberately run the XLA
path; static shapes throughout, and an optional
``return_attention`` forward for the attention-rollout visualizer
(utils/rollout.py; reference ecg_vit.py:164-265 uses a Recorder hook instead).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..configs import VitConfig
from ..ops.attention import attention
from ..ops.dropout import HashDropout


def _dtype(cfg: VitConfig):
    return jnp.bfloat16 if cfg.dtype == 'bfloat16' else jnp.float32


def _dropout(cfg: VitConfig, rate: float, salt: int):
    """Per-site dropout module.  ``dropout_impl='flax'`` (default -- measured
    FREE with the production rbg PRNG, PERF.md) uses ``nn.Dropout``;
    ``'hash'`` uses the stateless counter-hash mask (ops/dropout.py:
    bit-identical across backends/PRNG impls, the fast path under threefry).
    ``salt`` decorrelates sites beyond flax's per-path rng folding."""
    if cfg.dropout_impl == 'hash':
        return HashDropout(rate, salt=salt)
    if cfg.dropout_impl != 'flax':
        raise ValueError(
            f"dropout_impl must be 'flax' or 'hash', got {cfg.dropout_impl!r}")
    return nn.Dropout(rate)


class PatchEmbed1D(nn.Module):
    """(B, C, L) -> (B, n_patch, hidden): reshape into (C*patch)-dim patch
    vectors, then LayerNorm -> Dense -> LayerNorm (vit-pytorch to_patch_embedding)."""
    cfg: VitConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, c, length = x.shape
        assert c == cfg.num_channels, (c, cfg.num_channels)
        assert length % cfg.patch_size == 0, (length, cfg.patch_size)
        n_patch = length // cfg.patch_size
        # (B, C, P, patch) -> (B, P, C*patch); lead-major within a patch vector
        patches = x.reshape(b, c, n_patch, cfg.patch_size)
        patches = patches.transpose(0, 2, 1, 3).reshape(b, n_patch, c * cfg.patch_size)
        if cfg.patch_norm:
            patches = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name='pre_norm')(patches)
        h = nn.Dense(cfg.hidden_size, dtype=_dtype(cfg), name='proj')(patches)
        if cfg.patch_norm:
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name='post_norm')(h)
        return h


class SelfAttention(nn.Module):
    cfg: VitConfig

    @nn.compact
    def __call__(self, x, deterministic: bool, return_probs: bool = False):
        cfg = self.cfg
        b, t, _ = x.shape
        dt = _dtype(cfg)
        qkv = nn.Dense(3 * cfg.hidden_size, use_bias=False, dtype=dt, name='qkv')(x)
        qkv = qkv.reshape(b, t, 3, cfg.num_attention_heads, cfg.head_dim)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]  # (B,H,T,D)

        probs = None
        if cfg.ring_axis is not None:
            # context parallelism: the sequence is sharded over cfg.ring_axis
            # (we are inside a shard_map); K/V blocks ring around the mesh
            from ..parallel.ring_attention import ring_attention_local
            out = ring_attention_local(q, k, v, cfg.ring_axis)
            out = out.transpose(0, 2, 1, 3).reshape(b, t, cfg.hidden_size)
            out = nn.Dense(cfg.hidden_size, dtype=dt, name='out')(out)
            out = _dropout(cfg, cfg.hidden_dropout_prob, salt=1)(
                out, deterministic=deterministic)
            return out, None
        if return_probs:
            scale = 1.0 / np.sqrt(cfg.head_dim)
            logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                                preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum('bhqk,bhkd->bhqd', probs.astype(v.dtype), v)
        else:
            rng = (None if deterministic or cfg.attention_probs_dropout_prob == 0.0
                   else self.make_rng('dropout'))
            out = attention(
                q, k, v,
                dropout_rate=cfg.attention_probs_dropout_prob,
                deterministic=deterministic, dropout_rng=rng,
                use_flash=cfg.use_flash_attention,
                min_seq=cfg.flash_min_seq,
                interpret=cfg.flash_interpret)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, cfg.hidden_size)
        out = nn.Dense(cfg.hidden_size, dtype=dt, name='out')(out)
        out = _dropout(cfg, cfg.hidden_dropout_prob, salt=2)(
            out, deterministic=deterministic)
        return out, probs


class Mlp(nn.Module):
    cfg: VitConfig

    @nn.compact
    def __call__(self, x, deterministic: bool):
        cfg = self.cfg
        dt = _dtype(cfg)
        h = nn.Dense(cfg.intermediate_size, dtype=dt, name='fc1')(x)
        # exact (erf) GELU, matching torch nn.GELU in the reference's vit-pytorch
        h = nn.gelu(h, approximate=False)
        h = _dropout(cfg, cfg.hidden_dropout_prob, salt=3)(h, deterministic=deterministic)
        h = nn.Dense(cfg.hidden_size, dtype=dt, name='fc2')(h)
        return _dropout(cfg, cfg.hidden_dropout_prob, salt=4)(h, deterministic=deterministic)


class Block(nn.Module):
    cfg: VitConfig
    use_moe: bool = False   # Switch MoE MLP instead of the dense one
                            # (models/moe.py; set per layer by the encoder)

    @nn.compact
    def __call__(self, x, deterministic: bool, return_probs: bool = False):
        attn_out, probs = SelfAttention(self.cfg, name='attn')(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name='norm1')(x),
            deterministic, return_probs)
        x = x + attn_out
        if self.use_moe:
            from .moe import MoeMlp
            mlp = MoeMlp(self.cfg, name='moe')
        else:
            mlp = Mlp(self.cfg, name='mlp')
        x = x + mlp(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name='norm2')(x), deterministic)
        return x, probs


class EcgVitEncoder(nn.Module):
    """Patch embed + cls token + pos emb + transformer stack + final norm.

    Shared by the supervised classifier and the MAE pretrainer.
    """
    cfg: VitConfig
    with_cls_token: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_attention: bool = False):
        cfg = self.cfg
        h = PatchEmbed1D(cfg, name='patch_embed')(x)
        b, n_patch, _ = h.shape
        n_tok = n_patch + (1 if self.with_cls_token else 0)
        if self.with_cls_token:
            cls = self.param('cls_token', nn.initializers.normal(0.02),
                             (1, 1, cfg.hidden_size))
            h = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(h.dtype), h],
                                axis=1)
        pos = self.param('pos_embed', nn.initializers.normal(0.02),
                         (1, cfg.max_signal_length // cfg.patch_size
                          + (1 if self.with_cls_token else 0), cfg.hidden_size))
        h = h + pos[:, :n_tok].astype(h.dtype)
        # reference: emb_dropout = attention_probs_dropout_prob (ecg_vit.py:114)
        h = _dropout(cfg, cfg.attention_probs_dropout_prob, salt=5)(
            h, deterministic=deterministic)

        attn_maps = []
        block_cls = Block
        if cfg.remat and not return_attention:
            # rematerialize each block's activations in the backward pass
            block_cls = nn.remat(Block, static_argnums=(2, 3))
        if cfg.moe_num_experts > 0:
            assert not cfg.scan_blocks, (
                'MoE blocks differ per layer; scan_blocks needs identical '
                'layers -- use the unrolled stack for MoE models')
        if cfg.scan_blocks and not return_attention:
            # one traced block, params stacked (L, ...): the XLA program is
            # ~L x smaller (fast remote compiles, big batches fit the
            # compiler's size limit); sharding rules handle the extra axis
            scan_block = nn.scan(
                block_cls, variable_axes={'params': 0},
                split_rngs={'params': True, 'dropout': True},
                length=cfg.num_hidden_layers,
                in_axes=(nn.broadcast, nn.broadcast))
            h, _ = scan_block(cfg, name='blocks')(h, deterministic, False)
        else:
            for i in range(cfg.num_hidden_layers):
                use_moe = (cfg.moe_num_experts > 0
                           and (i + 1) % cfg.moe_every == 0)
                h, probs = block_cls(cfg, use_moe=use_moe,
                                     name=f'block_{i}')(h, deterministic,
                                                        return_attention)
                if return_attention:
                    attn_maps.append(probs)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name='final_norm')(h)
        if return_attention:
            return h, jnp.stack(attn_maps, axis=0)  # (L, B, H, T, T)
        return h


@dataclasses.dataclass
class VitOutput:
    """Mirrors the reference ``ModelOutput(loss, logits)`` (util/models.py:3)."""
    logits: jnp.ndarray
    loss: Optional[jnp.ndarray] = None
    attention: Optional[jnp.ndarray] = None


class EcgVit(nn.Module):
    """Supervised multi-label classifier (reference EcgVit, ecg_vit.py:95-149)."""
    cfg: VitConfig

    @nn.compact
    def __call__(self, sample_values, labels=None, deterministic: bool = True,
                 loss_reduction: str = 'mean', loss_weight=None,
                 return_attention: bool = False) -> VitOutput:
        cfg = self.cfg
        enc = EcgVitEncoder(cfg, with_cls_token=True, name='encoder')
        if return_attention:
            h, attn = enc(sample_values, deterministic, return_attention=True)
        else:
            h, attn = enc(sample_values, deterministic), None
        pooled = h[:, 0] if cfg.pool == 'cls' else h.mean(axis=1)
        logits = nn.Dense(cfg.num_class, dtype=jnp.float32, name='head')(
            pooled.astype(jnp.float32))

        loss = None
        if labels is not None:
            loss = bce_with_logits(logits, labels, reduction=loss_reduction,
                                   weight=loss_weight)
        return VitOutput(logits=logits, loss=loss, attention=attn)


def bce_with_logits(logits, labels, reduction: str = 'mean', weight=None):
    """BCEWithLogitsLoss (reference ecg_vit.py:118, 140-149).

    ``weight``: optional length-2 array (w_neg, w_pos) applied per element by
    label value, matching the reference's ``weight[labels.long()]`` mapping.
    ``reduction``: 'mean' | 'none' -- 'none' averages per sample over classes
    (the evaluator's per-sample loss path, train.py:355).
    """
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    # numerically stable: max(x,0) - x*y + log1p(exp(-|x|))
    per_elem = (jnp.maximum(logits, 0.0) - logits * labels
                + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    if weight is not None:
        w = jnp.asarray(weight, jnp.float32)
        per_elem = per_elem * w[labels.astype(jnp.int32)]
    if reduction == 'mean':
        return per_elem.mean()
    if reduction == 'none':
        return per_elem.mean(axis=-1)
    raise ValueError(f'Unknown reduction {reduction!r}')


def create_vit(cfg: VitConfig, rng: jax.Array, signal_length: Optional[int] = None):
    """Initialize an EcgVit and its params.  Returns (module, params)."""
    model = EcgVit(cfg)
    length = signal_length or cfg.max_signal_length
    dummy = jnp.zeros((1, cfg.num_channels, length), jnp.float32)
    params = model.init({'params': rng}, dummy)
    return model, params


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def forward_flops_per_sample(cfg: VitConfig) -> float:
    """Analytic matmul FLOPs of one supervised forward pass per sample
    (2*M*K*N per GEMM; elementwise/LayerNorm omitted -- standard MFU
    accounting).  Used by bench.py to report model FLOPs utilization."""
    t = cfg.num_patches + 1  # +cls token
    h, i = cfg.hidden_size, cfg.intermediate_size
    patch_embed = 2 * (cfg.num_channels * cfg.patch_size) * h * cfg.num_patches
    per_layer = (
        2 * h * 3 * h * t        # qkv projection
        + 2 * t * t * h          # q @ k^T (over all heads: H * T*T*D = T*T*h)
        + 2 * t * t * h          # probs @ v
        + 2 * h * h * t          # output projection
        + 2 * h * i * t * 2      # MLP fc1 + fc2
    )
    head = 2 * h * cfg.num_class
    return float(patch_embed + cfg.num_hidden_layers * per_layer + head)


def train_step_flops_per_sample(cfg: VitConfig) -> float:
    """fwd + bwd ~= 3x forward (the standard 1:2 fwd:bwd FLOP ratio)."""
    return 3.0 * forward_flops_per_sample(cfg)


def stack_unrolled_params(params, num_layers: int):
    """Inverse of :func:`unstack_scanned_params`: the unrolled ``block_i``
    layout (torch porter output, pre-scan checkpoints) -> the stacked
    ``scan_blocks=True`` tree (leading (L,) axis on ``blocks``)."""
    had_wrapper = 'params' in params
    p = dict(params['params'] if had_wrapper else params)
    enc = dict(p['encoder'])
    per_layer = [enc.pop(f'block_{i}') for i in range(num_layers)]
    enc['blocks'] = jax.tree.map(lambda *ls: jnp.stack(ls), *per_layer)
    p['encoder'] = enc
    return {'params': p} if had_wrapper else p


def unstack_scanned_params(params, num_layers: int):
    """Convert a ``scan_blocks=True`` param tree (stacked ``blocks`` with a
    leading (L,) axis) into the unrolled ``block_i`` layout, so scan-trained
    checkpoints drive the unrolled model -- attention-rollout visualization
    (return_attention needs per-layer modules) and the torch porter."""
    had_wrapper = 'params' in params
    p = dict(params['params'] if had_wrapper else params)
    enc = dict(p['encoder'])
    blocks = enc.pop('blocks')
    for i in range(num_layers):
        enc[f'block_{i}'] = jax.tree.map(lambda a, i=i: a[i], blocks)
    p['encoder'] = enc
    return {'params': p} if had_wrapper else p
