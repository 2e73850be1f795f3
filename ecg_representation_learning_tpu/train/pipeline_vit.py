"""Pipeline-parallel training of the real EcgVit model.

Round-2's :mod:`..parallel.pipeline_parallel` verified the functional core
(GPipe schedule over a raw block stack); this module makes pipeline
parallelism a *training mode* for the flagship classifier:

  * the transformer stack (``VitConfig.scan_blocks=True`` stacked layout,
    which is exactly ``stack_stage_params``'s input) is staged over a
    ``'stage'`` mesh axis -- each device holds L/S layers;
  * patch-embed / cls / pos-embed and final-norm / head are the boundary
    computations.  Their FLOPs are <1% of a block stack's, so they run under
    plain GSPMD (replicated over 'stage', sharded over 'data') rather than
    being pinned to stages -- mathematically identical to boundary-stage
    placement, with two fewer ppermute hops;
  * composes with data parallelism: a ('data', 'stage') mesh shards each
    microbatch's batch dim over 'data' (every data shard runs its own
    pipeline; gradient all-reduce over 'data' comes from GSPMD);
  * microbatch dropout is supported end-to-end: each (pipeline-step, stage,
    layer) folds its own PRNG stream (``pipeline_apply(rng=...)``).

The reference has no model parallelism of any kind (SURVEY.md §2.3); the
largest reference model (ViT-large, ~300 M params) fits one chip, so PP here
is the depth-scaling escape hatch, exposed via ``TrainConfig.mesh_stage``.
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import TrainConfig, VitConfig
from ..models.vit import (Block, EcgVit, PatchEmbed1D, _dropout,
                          bce_with_logits)
from ..parallel.pipeline_parallel import (STAGE_AXIS, pipeline_apply,
                                          place_stage_params,
                                          stack_stage_params)
from ..utils.logging import get_logger
from .optim import apply_optimizer, make_optimizer
from .trainer import SplitData, TrainState, _prep_batch

DATA_AXIS = 'data'


def make_pp_mesh(n_stage: int, n_data: int = 1, devices=None) -> Mesh:
    """('data', 'stage') mesh: microbatch batch dim over 'data', layers over
    'stage'."""
    devices = devices if devices is not None else jax.devices()
    assert n_data * n_stage == len(devices), (n_data, n_stage, len(devices))
    arr = np.asarray(devices).reshape(n_data, n_stage)
    return Mesh(arr, (DATA_AXIS, STAGE_AXIS))


def split_vit_params(variables, n_stage: int):
    """An ``EcgVit(scan_blocks=True)`` param tree -> (outer, stages).

    ``outer``: everything except the block stack (patch embed, cls/pos,
    final norm, head).  ``stages``: the stacked ``blocks`` params reshaped
    (S, L/S, ...) for ``P('stage')`` sharding."""
    p = dict(variables['params'])
    enc = dict(p['encoder'])
    blocks = enc.pop('blocks')
    p['encoder'] = enc
    return {'params': p}, stack_stage_params(blocks, n_stage)


def merge_vit_params(outer, stages):
    """Inverse of :func:`split_vit_params` (checkpoint interop with the
    plain ``scan_blocks`` layout)."""
    blocks = jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:]), stages)
    p = dict(outer['params'])
    enc = dict(p['encoder'])
    enc['blocks'] = blocks
    p['encoder'] = enc
    return {'params': p}


def pipeline_vit_forward(cfg: VitConfig, outer, stages, sig, mesh: Mesh,
                         n_micro: int, deterministic: bool = True,
                         rng=None):
    """EcgVit forward with the block stack pipelined over 'stage'.

    ``sig``: (B, C, L) already-normalized signals; B must divide n_micro.
    Boundary math mirrors ``EcgVitEncoder.__call__`` exactly
    (models/vit.py:140-182)."""
    enc_p = outer['params']['encoder']
    dt = jnp.bfloat16 if cfg.dtype == 'bfloat16' else jnp.float32

    h = PatchEmbed1D(cfg).apply({'params': enc_p['patch_embed']}, sig)
    b, n_patch, _ = h.shape
    cls = jnp.broadcast_to(enc_p['cls_token'],
                           (b, 1, cfg.hidden_size)).astype(h.dtype)
    h = jnp.concatenate([cls, h], axis=1)
    h = h + enc_p['pos_embed'][:, :n_patch + 1].astype(h.dtype)
    if not deterministic and cfg.attention_probs_dropout_prob > 0.0 and rng is not None:
        # same per-site dropout helper (and salt) as the plain model's
        # embedding site (models/vit.py:172) so dropout_impl='hash' keeps its
        # bit-identical-mask guarantee in pipeline mode too
        rng, emb_rng = jax.random.split(rng)
        h = _dropout(cfg, cfg.attention_probs_dropout_prob, salt=5).apply(
            {}, h, deterministic=False, rngs={'dropout': emb_rng})

    t = n_patch + 1
    assert b % n_micro == 0, (b, n_micro)
    h_micro = h.reshape(n_micro, b // n_micro, t, cfg.hidden_size)

    if deterministic or rng is None:
        def block_fn(lp, a):
            return Block(cfg).apply({'params': lp}, a, True)[0]
        h_micro = pipeline_apply(stages, h_micro, block_fn, mesh,
                                 x_spec=P(None, DATA_AXIS))
    else:
        rng, pp_rng = jax.random.split(rng)

        def block_fn(lp, a, key):
            return Block(cfg).apply({'params': lp}, a, False,
                                    rngs={'dropout': key})[0]
        h_micro = pipeline_apply(stages, h_micro, block_fn, mesh,
                                 x_spec=P(None, DATA_AXIS), rng=pp_rng)
    h = h_micro.reshape(b, t, cfg.hidden_size)

    h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32).apply(
        {'params': outer['params']['encoder']['final_norm']}, h)
    pooled = h[:, 0] if cfg.pool == 'cls' else h.mean(axis=1)
    logits = nn.Dense(cfg.num_class, dtype=jnp.float32).apply(
        {'params': outer['params']['head']}, pooled.astype(jnp.float32))
    return logits


class PipelineVitTrainer:
    """Minimal DP x PP training loop for EcgVit (``TrainConfig.mesh_stage``).

    Holds (outer, stages) as separate trees -- stages physically sharded
    P('stage') so each device stores only its layers -- and runs a donated
    jitted step: fused prep -> pipelined forward -> BCE -> grad -> clip ->
    AdamW.  Evaluation merges the params back into the plain ``scan_blocks``
    model (the boundary/stack split is a storage layout, not a semantic
    change)."""

    def __init__(self, model_cfg: VitConfig, train_cfg: TrainConfig,
                 train_data: Optional[SplitData] = None,
                 eval_data: Optional[SplitData] = None,
                 norm_stats: Optional[Dict[str, Any]] = None,
                 n_micro: Optional[int] = None,
                 output_dir: Optional[str] = None, mesh: Optional[Mesh] = None):
        assert model_cfg.scan_blocks, 'pipeline staging needs the stacked layout'
        assert train_cfg.mesh_stage > 1, 'use Trainer for mesh_stage == 1'
        if train_cfg.grad_accum > 1 or train_cfg.ema_decay > 0:
            raise NotImplementedError(
                'grad_accum/ema_decay are not implemented on the pipeline '
                'trainer (microbatching already splits the batch; EMA lives '
                'on the plain Trainer) -- unset them rather than silently '
                'ignoring them')
        self.model_cfg, self.cfg = model_cfg, train_cfg
        self.model = EcgVit(model_cfg)
        self.train_data, self.eval_data = train_data, eval_data
        stats = norm_stats or {'mean': [0.0] * model_cfg.num_channels,
                               'std': [1.0] * model_cfg.num_channels}
        self.mean = jnp.asarray(stats['mean'], jnp.float32)
        self.std = jnp.asarray(stats['std'], jnp.float32)
        self.mesh = mesh if mesh is not None else make_pp_mesh(
            train_cfg.mesh_stage, train_cfg.mesh_data or 1)
        self.n_micro = n_micro or 2 * train_cfg.mesh_stage  # GPipe default
        self.output_dir = output_dir or os.path.join('runs', 'pp')
        n_train = len(train_data) if train_data is not None else 1
        self.total_steps = train_cfg.total_steps(n_train)
        self.optimizer, self.schedule = make_optimizer(train_cfg,
                                                       self.total_steps)
        self.state: Optional[TrainState] = None
        self._train_step = None
        self._host_step = 0
        self.epoch = 0
        self.logger = get_logger('EcgVit PP Train')

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        rng, init_rng = jax.random.split(rng)
        dummy = jnp.zeros((1, self.model_cfg.num_channels,
                           self.model_cfg.max_signal_length), jnp.float32)
        variables = self.model.init({'params': init_rng}, dummy)
        outer, stages = split_vit_params(variables,
                                         self.mesh.shape[STAGE_AXIS])
        stages = place_stage_params(stages, self.mesh)
        rep = NamedSharding(self.mesh, P())
        outer = jax.tree.map(lambda a: jax.device_put(a, rep), outer)
        params = {'outer': outer, 'stages': stages}
        self._finalize_optimizer(params)
        opt_state = self.optimizer.init(params)
        # moment trees mirror params, so Adam state for the stages is sharded
        # P('stage') as well (device_put follows the param leaves' shardings)
        opt_state = jax.tree.map(
            lambda a: jax.device_put(a, rep) if np.ndim(a) == 0 else a,
            opt_state)
        self.state = TrainState(
            step=jax.device_put(jnp.zeros((), jnp.int32), rep),
            params=params, opt_state=opt_state,
            rng=jax.device_put(rng, rep))
        return self.state

    def _finalize_optimizer(self, params):
        """Linear-probe mask (head-only updates) once a param tree exists;
        idempotent.  ``linear_probe_mask`` keys on 'head' in the leaf path,
        which the {'outer': {'params': {'head': ...}}} layout satisfies."""
        if self.cfg.linear_probe and not getattr(self, '_probe_applied', False):
            import dataclasses

            from .optim import FusedAdamW
            from .pretrain import linear_probe_mask
            if isinstance(self.optimizer, FusedAdamW):
                # optax.masked needs the transform interface (see
                # Trainer._finalize_optimizer)
                self.optimizer, self.schedule = make_optimizer(
                    dataclasses.replace(self.cfg, fused_optimizer=False),
                    self.total_steps)
            mask = linear_probe_mask(params)
            frozen = optax.masked(optax.set_to_zero(),
                                  jax.tree.map(lambda m: not m, mask))
            self.optimizer = optax.chain(self.optimizer, frozen)
            self._probe_applied = True

    def set_merged_params(self, merged):
        """Install a plain ``scan_blocks``-layout param tree (a ported
        reference checkpoint, an MAE-transferred trunk) into the staged
        layout, re-initializing the optimizer state."""
        if self.state is None:
            self.init_state()
        outer, stages = split_vit_params(merged, self.mesh.shape[STAGE_AXIS])
        stages = place_stage_params(
            jax.tree.map(jnp.asarray, stages), self.mesh)
        rep = NamedSharding(self.mesh, P())
        outer = jax.tree.map(
            lambda a: jax.device_put(jnp.asarray(a), rep), outer)
        params = {'outer': outer, 'stages': stages}
        self._finalize_optimizer(params)
        opt_state = self.optimizer.init(params)
        opt_state = jax.tree.map(
            lambda a: jax.device_put(a, rep) if np.ndim(a) == 0 else a,
            opt_state)
        self.state = self.state.replace(params=params, opt_state=opt_state)
        return self.state

    def _build_step(self):
        cfg, model_cfg = self.cfg, self.model_cfg
        mean, std, patch = self.mean, self.std, self.model_cfg.patch_size
        mesh, n_micro = self.mesh, self.n_micro
        dropout_on = (model_cfg.hidden_dropout_prob > 0
                      or model_cfg.attention_probs_dropout_prob > 0)

        def train_step(state: TrainState, sig, labels):
            rng, to_rng, do_rng = jax.random.split(state.rng, 3)
            sig = jax.lax.with_sharding_constraint(sig, P(DATA_AXIS))
            labels = jax.lax.with_sharding_constraint(labels, P(DATA_AXIS))
            sig = _prep_batch(sig, mean, std, patch, train=cfg.augment_timeout,
                              rng=to_rng)
            sig = sig[..., :model_cfg.max_signal_length]

            def loss_fn(params):
                logits = pipeline_vit_forward(
                    model_cfg, params['outer'], params['stages'], sig, mesh,
                    n_micro, deterministic=not dropout_on,
                    rng=do_rng if dropout_on else None)
                return bce_with_logits(logits, labels,
                                       weight=cfg.loss_weight)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            params, opt_state = apply_optimizer(self.optimizer, grads,
                                                state.opt_state, state.params)
            return TrainState(step=state.step + 1, params=params,
                              opt_state=opt_state, rng=rng), loss

        with self.mesh:
            self._train_step = jax.jit(train_step, donate_argnums=(0,))

    def train(self) -> Dict[str, Any]:
        cfg = self.cfg
        if self.state is None:
            self.init_state()
        if self._train_step is None:
            self._build_step()
        host_rng = np.random.default_rng(cfg.seed)
        n = len(self.train_data)
        if n < cfg.train_batch_size:
            raise ValueError(
                f'training split ({n} records) is smaller than one batch '
                f'({cfg.train_batch_size}); lower train_batch_size -- the '
                f'pipelined step needs full batches (B % n_micro == 0)')
        t0 = time.time()
        last_loss = float('nan')
        for _ in range(cfg.num_train_epoch):
            idx = np.arange(n)
            host_rng.shuffle(idx)
            stop = (n // cfg.train_batch_size) * cfg.train_batch_size
            for i in range(0, stop, cfg.train_batch_size):
                take = idx[i:i + cfg.train_batch_size]
                sig = jnp.asarray(self.train_data.signals[take], jnp.float32)
                lab = jnp.asarray(self.train_data.labels[take], jnp.float32)
                with self.mesh:
                    self.state, loss = self._train_step(self.state, sig, lab)
                self._host_step += 1
            last_loss = float(loss)
            self.epoch += 1
            self.logger.info({'pp/loss': last_loss, 'step': self._host_step})
            if cfg.save_every_n_epoch and self.epoch % cfg.save_every_n_epoch == 0:
                self.save_checkpoint(tag=f'ep{self.epoch}')
        if cfg.save_final:
            self.save_checkpoint(tag='final')
        if cfg.async_checkpoint:
            from .checkpoint import wait_for_checkpoints
            wait_for_checkpoints()
        return {'loss': last_loss, 'steps': self._host_step,
                'seconds': time.time() - t0}

    # ------------------------------------------------------------ checkpoints
    def save_checkpoint(self, tag: str = 'final') -> str:
        """Full (step, params{outer,stages}, opt_state, rng) state -- the
        stage-sharded layout round-trips as saved."""
        from .checkpoint import save_checkpoint
        os.makedirs(self.output_dir, exist_ok=True)
        path = os.path.join(os.path.abspath(self.output_dir), f'ckpt-{tag}')
        save_checkpoint(path, self.state,
                        extra={'epoch': self.epoch,
                               'host_step': self._host_step},
                        async_save=self.cfg.async_checkpoint)
        self.logger.info(f'Checkpoint saved to {path}')
        return path

    def load_checkpoint(self, path: str):
        """Exact restore; every leaf is re-placed onto the mesh with the
        live state's sharding (stages P('stage'), the rest replicated)."""
        from .checkpoint import restore_checkpoint
        if self.state is None:
            self.init_state()
        state, extra = restore_checkpoint(path, self.state)
        with self.mesh:
            self.state = jax.tree.map(
                lambda restored, live: jax.device_put(restored, live.sharding),
                state, self.state)
        self.epoch = int(extra.get('epoch', 0))
        self._host_step = int(extra.get('host_step', 0))
        return self.state

    def merged_params(self):
        """Params in the plain ``scan_blocks`` layout (single-device eval /
        checkpoint interop with ``Trainer``)."""
        return merge_vit_params(self.state.params['outer'],
                                self.state.params['stages'])
