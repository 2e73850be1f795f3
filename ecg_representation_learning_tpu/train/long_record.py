"""Long-record masked-signal pretraining with context parallelism.

The parity models cap sequences at 2,560 samples (41 tokens); the corpora the
reference merely *stores* (INCART 30-minute strips, MIMIC-IV-ECG) motivate
pretraining on records far beyond one chip's attention memory.  This module
makes that "a config change" for real (SURVEY §2.3 design bar):

  * masked-signal modeling with IN-PLACE mask tokens (SimMIM-style) rather
    than MAE's gather-of-visible-patches -- the gather would shuffle patches
    ACROSS sequence shards and break context parallelism, while mask tokens
    keep every shard's token count static and local;
  * the encoder is the same ``Block`` stack as ``EcgVit`` with
    ``VitConfig.ring_axis`` set, so attention runs ring-sharded over the mesh
    (parallel/ring_attention.py: fwd + custom-VJP bwd, K/V grads ride the
    ring) while everything else is token-local;
  * the train step is a ``shard_map`` over the mesh: signals/masks sharded
    over the sequence axis, params replicated (their gradients are psummed by
    the shard_map transpose), loss psummed explicitly;
  * each shard adds its own slice of the global position embedding via
    ``jax.lax.axis_index`` -- positions stay globally consistent.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..configs import TrainConfig, VitConfig
from ..models.mae import patchify
from ..models.vit import Block, PatchEmbed1D, _dtype
from .optim import apply_optimizer, make_optimizer


class EcgMim(nn.Module):
    """Masked-signal-modeling trunk over ONE sequence shard.

    Inputs are shard-local: ``x`` (B, C, L_local), ``mask`` (B, P_local) with
    1 = masked.  ``pos_offset`` is this shard's global patch offset.  Returns
    (masked-MSE sum, masked count) for the caller to psum across shards.
    """
    cfg: VitConfig

    @nn.compact
    def __call__(self, x, mask, pos_offset, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        b, c, length = x.shape
        p_local = length // cfg.patch_size
        h = PatchEmbed1D(cfg, name='patch_embed')(x)          # (B, P_local, H)
        mask_token = self.param('mask_token', nn.initializers.normal(0.02),
                                (1, 1, cfg.hidden_size))
        h = jnp.where(mask[..., None] > 0, mask_token.astype(h.dtype), h)
        pos = self.param('pos_embed', nn.initializers.normal(0.02),
                         (1, cfg.num_patches, cfg.hidden_size))
        pos_local = jax.lax.dynamic_slice_in_dim(pos, pos_offset, p_local, axis=1)
        h = h + pos_local.astype(h.dtype)
        for i in range(cfg.num_hidden_layers):
            h, _ = Block(cfg, name=f'block_{i}')(h, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name='final_norm')(h)
        pred = nn.Dense(c * cfg.patch_size, dtype=jnp.float32, name='pred')(
            h.astype(jnp.float32))

        target = patchify(x, cfg.patch_size).astype(jnp.float32)
        mu = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mu) / jnp.sqrt(var + 1e-6)
        per_patch = ((pred - target) ** 2).mean(axis=-1)      # (B, P_local)
        return (per_patch * mask).sum(), mask.sum()


def _exact_count_mask(rng: jax.Array, batch: int, n_patches: int,
                      n_mask: int) -> jnp.ndarray:
    """Per-sample patch mask with EXACTLY ``n_mask`` ones per row, generated
    on device (no host-side Python loop): rank a uniform draw per row and
    mask its ``n_mask`` smallest entries."""
    u = jax.random.uniform(rng, (batch, n_patches))
    kth = jnp.sort(u, axis=1)[:, n_mask - 1:n_mask]
    return (u <= kth).astype(jnp.float32)


class RingPretrainer:
    """Context-parallel masked-signal pretrainer: sequence sharded over
    ``seq_axis`` of ``mesh``, ring attention inside, params replicated.

    Round-3 hardening (the loop aimed at the LONGEST-running jobs):
    full (step, params, opt_state, rng) train state, orbax checkpoint /
    kill-and-resume (deterministic streams skip consumed batches, the
    resumable-export ethos of DataExport.m:28-44), and device-side mask
    generation inside the jitted step (the round-2 host loop built masks in
    Python per sample)."""

    def __init__(self, model_cfg: VitConfig, train_cfg: TrainConfig,
                 mesh: Mesh, seq_axis: str = 'data',
                 mask_ratio: float = 0.5, total_steps: int = 1000,
                 output_dir: str = None):
        import os
        assert model_cfg.ring_axis == seq_axis, \
            'set VitConfig.ring_axis to the sequence mesh axis'
        self.cfg = model_cfg
        self.train_cfg = train_cfg
        self.mesh = mesh
        self.seq_axis = seq_axis
        self.n_shards = mesh.shape[seq_axis]
        self.mask_ratio = mask_ratio
        assert model_cfg.max_signal_length % (model_cfg.patch_size * self.n_shards) == 0
        self.model = EcgMim(model_cfg)
        self.optimizer, self.schedule = make_optimizer(train_cfg, total_steps)
        self.state = None
        self.output_dir = output_dir or os.path.join('runs', 'ring-cp')
        self._step = None

    def init(self, seed: int = 0):
        import dataclasses

        from .trainer import TrainState
        cfg = self.cfg
        l_local = cfg.max_signal_length // self.n_shards
        p_local = l_local // cfg.patch_size
        dummy_x = jnp.zeros((1, cfg.num_channels, l_local), jnp.float32)
        dummy_m = jnp.zeros((1, p_local), jnp.float32)
        # init outside shard_map: the ring path needs a live axis name, but
        # its param tree is identical to plain attention -- init without it
        init_model = EcgMim(dataclasses.replace(cfg, ring_axis=None))
        rng = jax.random.PRNGKey(seed)
        rng, init_rng = jax.random.split(rng)
        params = init_model.init({'params': init_rng}, dummy_x, dummy_m, 0)
        self.state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                                opt_state=self.optimizer.init(params), rng=rng)
        return self.state

    def _build(self):
        from .trainer import TrainState
        cfg, mesh, axis = self.cfg, self.mesh, self.seq_axis
        p_total = cfg.num_patches
        p_local = p_total // self.n_shards
        n_mask = max(1, int(round(p_total * self.mask_ratio)))
        model = self.model

        def local_loss(params, x_loc, m_loc):
            offset = jax.lax.axis_index(axis) * p_local
            loss_sum, cnt = model.apply(params, x_loc, m_loc, offset)
            loss_sum = jax.lax.psum(loss_sum, axis)
            cnt = jax.lax.psum(cnt, axis)
            return loss_sum / jnp.maximum(cnt, 1.0)

        xs = P(None, None, axis)   # (B, C, L) sequence-sharded
        ms = P(None, axis)         # (B, P) patch-mask sharded the same way
        sharded_loss = jax.shard_map(
            local_loss, mesh=mesh, in_specs=(P(), xs, ms), out_specs=P(),
            check_vma=False)

        def step(state: TrainState, x):
            rng, mask_rng = jax.random.split(state.rng)
            # mask generated ON DEVICE, global patch indexing, exact count
            m = _exact_count_mask(mask_rng, x.shape[0], p_total, n_mask)
            loss, grads = jax.value_and_grad(
                lambda p: sharded_loss(p, x, m))(state.params)
            params, opt_state = apply_optimizer(self.optimizer, grads,
                                                state.opt_state, state.params)
            return TrainState(step=state.step + 1, params=params,
                              opt_state=opt_state, rng=rng), loss

        with mesh:
            self._step = jax.jit(step, donate_argnums=(0,))

    # ------------------------------------------------------------ checkpoints
    def save_checkpoint(self, tag: Optional[str] = None) -> str:
        """Step-tagged save (``ckpt-step{N}``): each save targets a FRESH
        path, so a crash mid-write never deletes the previous committed
        checkpoint (the round-2 single ``ckpt-latest`` + force overwrite had
        a no-restorable-checkpoint window)."""
        import os

        from .checkpoint import save_checkpoint
        tag = tag or f'step{int(self.state.step)}'
        path = os.path.join(os.path.abspath(self.output_dir), f'ckpt-{tag}')
        return save_checkpoint(path, self.state,
                               async_save=self.train_cfg.async_checkpoint)

    def latest_checkpoint(self):
        from .checkpoint import latest_committed_checkpoint
        return latest_committed_checkpoint(self.output_dir)

    def _prune_checkpoints(self, keep: int = 2):
        """Drop all but the newest ``keep`` committed step-tagged checkpoints
        (an in-flight async save is tmp-named, hence never a deletion
        target)."""
        from .checkpoint import prune_checkpoints
        prune_checkpoints(self.output_dir, keep=keep)

    def load_checkpoint(self, path: str):
        from .checkpoint import restore_checkpoint
        if self.state is None:
            self.init()
        self.state, _ = restore_checkpoint(path, self.state)
        return self.state

    def train(self, batches: Iterable[np.ndarray], steps: int,
              seed: int = 0, ckpt_every: int = 0,
              resume: bool = False) -> Dict[str, Any]:
        """``batches``: iterator of (B, C, max_signal_length) arrays (e.g. a
        :class:`~..data.pipeline.ShardedRecordStream`).  ``ckpt_every`` saves
        every N steps; ``resume=True`` restores the latest checkpoint and,
        for a deterministic stream, skips the consumed batches so the
        continued run matches an uninterrupted one."""
        import itertools
        import os
        start_step = 0
        if resume:
            path = self.latest_checkpoint()
            if path:
                self.load_checkpoint(path)
                start_step = int(self.state.step)
        if self.state is None:
            self.init(seed)
        if self._step is None:
            self._build()
        if ckpt_every:
            os.makedirs(self.output_dir, exist_ok=True)
        losses = []
        host_step = start_step
        saved_at = -1
        for x in itertools.islice(iter(batches), start_step, steps):
            x = jnp.asarray(np.asarray(x, np.float32))
            with self.mesh:
                self.state, loss = self._step(self.state, x)
            losses.append(float(loss))
            host_step += 1
            if ckpt_every and host_step % ckpt_every == 0:
                self.save_checkpoint(tag=f'step{host_step}')
                self._prune_checkpoints()
                saved_at = host_step
        if ckpt_every and host_step != saved_at:
            self.save_checkpoint(tag=f'step{host_step}')
            self._prune_checkpoints()
        if self.train_cfg.async_checkpoint:
            from .checkpoint import wait_for_checkpoints
            wait_for_checkpoints()   # durable before returning
        return {'losses': losses, 'loss': losses[-1] if losses else None,
                'steps': host_step}
