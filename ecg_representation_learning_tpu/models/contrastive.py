"""Contrastive (SimCLR-style) self-supervised model for 12-lead ECG.

Second pretraining family next to the masked-patch MAE (models/mae.py).  The
reference's headline metric is defined by *Self-supervised representation
learning from 12-lead ECG data* (reference util/train.py:34-40), whose
pretraining is contrastive -- the reference never implements any pretraining
loop (its self-supervised track stops at the clustering tokenizer,
models/ecg_tokenizer.py).  This module supplies it TPU-first:

  * the trunk is the SAME ``EcgVitEncoder`` the classifier and the MAE use
    (models/vit.py:148-199), under the same ``'encoder'`` name -- transfer
    into ``EcgVit`` is a verbatim subtree copy (train/contrastive.py);
  * the projection head is a small MLP whose output is L2-normalized in
    float32 (cosine-similarity geometry; bf16 trunks keep a f32 loss);
  * NT-Xent runs on the MXU as one (2B, d) x (d, 2B) matmul; under a sharded
    batch GSPMD inserts the all-gather of the (2B, d) projections over ICI,
    giving every chip the full global negative pool with one small collective
    -- the idiomatic TPU replacement for torch-style gather-with-grad tricks.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import ContrastiveConfig, VitConfig
from .vit import EcgVitEncoder, _dtype


class EcgContrastive(nn.Module):
    """Shared ViT trunk + projection head; ``__call__`` embeds a batch of
    (already augmented) views and returns unit-norm projections."""
    cfg: VitConfig
    con_cfg: ContrastiveConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        h = EcgVitEncoder(cfg, with_cls_token=True, name='encoder')(
            x, deterministic)
        pooled = h[:, 0] if cfg.pool == 'cls' else h.mean(axis=1)
        z = nn.Dense(self.con_cfg.proj_hidden_size, dtype=_dtype(cfg),
                     name='proj_fc1')(pooled)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(self.con_cfg.proj_dim, dtype=jnp.float32,
                     name='proj_fc2')(z.astype(jnp.float32))
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True).clip(1e-8)


def nt_xent(z: jnp.ndarray, temperature: float = 0.1,
            with_accuracy: bool = False):
    """Normalized-temperature cross entropy over paired views.

    ``z``: (2B, d) unit-norm projections laid out [views_a; views_b] -- row i
    and row (i + B) mod 2B are the positive pair.  Returns the mean InfoNCE
    loss over all 2B anchors (and optionally the top-1 retrieval accuracy, a
    progress metric that is comparable across batch sizes).
    """
    z = z.astype(jnp.float32)
    n = z.shape[0]
    b = n // 2
    # (2B, 2B) on the MXU; the matrix is tiny (d<=128) so full-f32 passes are
    # free, and default (bf16-operand) precision costs ~4e-3 on the logits
    sim = jnp.matmul(z, z.T,
                     precision=jax.lax.Precision.HIGHEST) / jnp.float32(temperature)
    diag = jnp.eye(n, dtype=bool)
    sim = jnp.where(diag, -jnp.inf, sim)                    # self is not a pair
    pos_idx = (jnp.arange(n) + b) % n
    logprob = jax.nn.log_softmax(sim, axis=-1)
    loss = -jnp.take_along_axis(logprob, pos_idx[:, None], axis=-1).mean()
    if not with_accuracy:
        return loss
    acc = (jnp.argmax(sim, axis=-1) == pos_idx).mean()
    return loss, acc
