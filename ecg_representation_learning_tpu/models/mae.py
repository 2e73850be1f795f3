"""Masked-autoencoder (MAE-style) self-supervised pretraining for ECG.

North-star addition (BASELINE.json configs 2-3): the reference *names*
self-supervised pretraining as its goal (dataset.py:2-5) but only ships the
clustering tokenizer; this module implements masked-patch reconstruction:
75% of the (12 x 64)-sample patches are masked, the encoder (shared with
``EcgVit``) sees only visible patches, and a light decoder reconstructs the
masked patches under MSE (He et al. 2022 recipe, adapted to 1-D signals).

TPU notes: the random mask is a per-sample argsort-of-uniform permutation with
a *static* visible count, so every shape is static under jit; gathers are
``take_along_axis`` over the patch axis (tiny: <=40 patches).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import MaeConfig, VitConfig
from .vit import EcgVitEncoder, PatchEmbed1D, _dtype


@dataclasses.dataclass
class MaeOutput:
    loss: jnp.ndarray
    pred: jnp.ndarray        # (B, P, C*patch) reconstructed patches
    mask: jnp.ndarray        # (B, P) 1 = masked (reconstructed), 0 = visible
    ids_restore: jnp.ndarray
    per_sample_loss: Optional[jnp.ndarray] = None  # (B,) masked-MSE per sample
                             # (partial-batch eval: pad to the batch size,
                             # keep the real rows -- train/pretrain.evaluate)


def patchify(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, C, L) -> (B, P, C*patch), matching PatchEmbed1D's layout."""
    b, c, length = x.shape
    p = length // patch_size
    return x.reshape(b, c, p, patch_size).transpose(0, 2, 1, 3).reshape(b, p, c * patch_size)


def unpatchify(patches: jnp.ndarray, num_channels: int, patch_size: int) -> jnp.ndarray:
    b, p, _ = patches.shape
    x = patches.reshape(b, p, num_channels, patch_size).transpose(0, 2, 1, 3)
    return x.reshape(b, num_channels, p * patch_size)


def random_masking(rng, batch: int, n_patch: int, mask_ratio: float):
    """Per-sample random patch permutation with a static visible count.

    Returns (ids_keep (B, V), ids_restore (B, P), mask (B, P)).
    """
    len_keep = max(1, int(round(n_patch * (1.0 - mask_ratio))))
    noise = jax.random.uniform(rng, (batch, n_patch))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    mask = jnp.ones((batch, n_patch))
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return ids_keep, ids_restore, mask


class MaeDecoder(nn.Module):
    cfg: VitConfig
    mae: MaeConfig

    @nn.compact
    def __call__(self, h_visible, ids_restore, deterministic: bool = True):
        cfg, mae = self.cfg, self.mae
        b, v, _ = h_visible.shape
        p = ids_restore.shape[1]
        dec_cfg = dataclasses.replace(
            cfg,
            hidden_size=mae.decoder_hidden_size,
            num_hidden_layers=mae.decoder_num_layers,
            num_attention_heads=mae.decoder_num_heads,
            intermediate_size=mae.decoder_intermediate_size,
        )
        from .vit import Block  # local import to avoid cycle at module load
        dt = _dtype(cfg)
        h = nn.Dense(mae.decoder_hidden_size, dtype=dt, name='embed')(h_visible)
        mask_token = self.param('mask_token', nn.initializers.normal(0.02),
                                (1, 1, mae.decoder_hidden_size))
        mask_tokens = jnp.broadcast_to(mask_token, (b, p - v, mae.decoder_hidden_size))
        h_full = jnp.concatenate([h, mask_tokens.astype(h.dtype)], axis=1)
        # unshuffle back to natural patch order
        h_full = jnp.take_along_axis(h_full, ids_restore[:, :, None], axis=1)
        pos = self.param('pos_embed', nn.initializers.normal(0.02),
                         (1, cfg.max_signal_length // cfg.patch_size,
                          mae.decoder_hidden_size))
        h_full = h_full + pos[:, :p].astype(h_full.dtype)
        for i in range(mae.decoder_num_layers):
            h_full, _ = Block(dec_cfg, name=f'block_{i}')(h_full, deterministic)
        h_full = nn.LayerNorm(dtype=jnp.float32, name='norm')(h_full)
        return nn.Dense(cfg.num_channels * cfg.patch_size, dtype=jnp.float32,
                        name='pred')(h_full.astype(jnp.float32))


class EcgMae(nn.Module):
    """Masked-patch pretrainer sharing the ``EcgVitEncoder`` trunk."""
    cfg: VitConfig
    mae: MaeConfig = MaeConfig()

    @nn.compact
    def __call__(self, sample_values, mask_rng=None, deterministic: bool = True
                 ) -> MaeOutput:
        cfg, mae = self.cfg, self.mae
        b, c, length = sample_values.shape
        n_patch = length // cfg.patch_size
        if mask_rng is None:
            mask_rng = self.make_rng('mask')
        ids_keep, ids_restore, mask = random_masking(mask_rng, b, n_patch, mae.mask_ratio)

        # --- encoder on visible patches only (no cls token for pretraining) ---
        embed = PatchEmbed1D(cfg, name='encoder_patch_embed')
        h = embed(sample_values)                          # (B, P, H)
        pos = self.param('encoder_pos_embed', nn.initializers.normal(0.02),
                         (1, cfg.max_signal_length // cfg.patch_size, cfg.hidden_size))
        h = h + pos[:, :n_patch].astype(h.dtype)
        h = jnp.take_along_axis(h, ids_keep[:, :, None], axis=1)  # (B, V, H)
        from .vit import Block
        for i in range(cfg.num_hidden_layers):
            # same MoE placement rule as EcgVitEncoder, so a Switch trunk
            # pretrains with its experts live (and transfers layer-for-layer)
            use_moe = (cfg.moe_num_experts > 0
                       and (i + 1) % cfg.moe_every == 0)
            h, _ = Block(cfg, use_moe=use_moe,
                         name=f'encoder_block_{i}')(h, deterministic)
        h = nn.LayerNorm(dtype=jnp.float32, name='encoder_norm')(h)

        # --- decoder over full sequence ---
        pred = MaeDecoder(cfg, mae, name='decoder')(h, ids_restore, deterministic)

        # --- MSE on masked patches ---
        target = patchify(sample_values, cfg.patch_size).astype(jnp.float32)
        if mae.norm_patch_targets:
            mu = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mu) / jnp.sqrt(var + 1e-6)
        per_patch = ((pred - target) ** 2).mean(axis=-1)   # (B, P)
        loss = (per_patch * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        per_sample = ((per_patch * mask).sum(axis=1)
                      / jnp.maximum(mask.sum(axis=1), 1.0))
        return MaeOutput(loss=loss, pred=pred, mask=mask,
                         ids_restore=ids_restore, per_sample_loss=per_sample)
