"""MAE pretraining loop + pretrained-encoder transfer (probe / fine-tune).

North-star pipeline (BASELINE.json configs 2-4): masked-patch pretraining of
the shared encoder, then either linear probing (frozen trunk, train the head)
or full fine-tuning on PTB-XL.  The reference has no pretraining loop (its
self-supervised track is the clustering tokenizer only); loop mechanics mirror
the supervised Trainer (trainer.py).
"""
from __future__ import annotations

import dataclasses
import os
import time
import weakref
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from ..configs import MaeConfig, TrainConfig, VitConfig
from ..models.mae import EcgMae
from ..parallel.mesh import (DATA_AXIS, batch_sharding, make_mesh,
                             opt_state_shardings, param_shardings, replicated)
from ..utils.logging import TbWriter, get_logger
from .loop import finish_update, grad_accum_scan
from .optim import make_optimizer
from .trainer import SplitData, TrainState, _prep_batch


class MaeTrainer:
    """Self-supervised masked-patch pretrainer."""

    def __init__(
        self,
        model_cfg: VitConfig,
        mae_cfg: MaeConfig,
        train_cfg: TrainConfig,
        train_data: Optional[SplitData] = None,
        eval_data: Optional[SplitData] = None,
        norm_stats: Optional[Dict[str, Any]] = None,
        output_dir: Optional[str] = None,
        mesh=None,
    ):
        assert train_cfg.train_batch_size % max(1, train_cfg.grad_accum) == 0, \
            (train_cfg.train_batch_size, train_cfg.grad_accum)
        self.model_cfg, self.mae_cfg, self.cfg = model_cfg, mae_cfg, train_cfg
        self.model = EcgMae(model_cfg, mae_cfg)
        self.train_data, self.eval_data = train_data, eval_data
        stats = norm_stats or {'mean': [0.0] * model_cfg.num_channels,
                               'std': [1.0] * model_cfg.num_channels}
        self.mean = jnp.asarray(stats['mean'], jnp.float32)
        self.std = jnp.asarray(stats['std'], jnp.float32)
        self.mesh = mesh if mesh is not None else make_mesh(
            n_data=train_cfg.mesh_data, n_model=train_cfg.mesh_model)
        jax.config.update('jax_default_prng_impl', train_cfg.prng_impl)
        self.output_dir = output_dir or os.path.join('runs', 'mae')
        n_train = len(train_data) if train_data is not None else 1
        self.steps_per_epoch = train_cfg.steps_per_epoch(n_train)
        self.total_steps = train_cfg.total_steps(n_train)
        self.optimizer, self.schedule = make_optimizer(train_cfg, self.total_steps)
        self.state: Optional[TrainState] = None
        self.epoch = 0
        self._host_step = 0   # mirrors state.step without per-step device syncs
        self._resident = {}   # id(SplitData) -> signals in HBM
        self._train_step = None
        self._eval_step = None
        self.logger = get_logger('EcgMae Pretrain')

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        rng, init_rng, mask_rng = jax.random.split(rng, 3)
        dummy = jnp.zeros((1, self.model_cfg.num_channels,
                           self.model_cfg.max_signal_length), jnp.float32)
        variables = self.model.init({'params': init_rng, 'mask': mask_rng}, dummy)
        # strip non-param collections (a MoE trunk also inits the sown 'moe'
        # aux-loss collection)
        params = ({'params': variables['params']}
                  if set(variables) != {'params'} else variables)
        opt_state = self.optimizer.init(params)
        # same parallel surface as the supervised Trainer: TP/Megatron param
        # rules + optional ZeRO/FSDP storage sharding of params AND the Adam
        # moments over the data axis
        pspec = param_shardings(params, self.mesh, fsdp=self.cfg.fsdp)
        osh = opt_state_shardings(opt_state, pspec, self.mesh)
        placed = jax.tree.map(jax.device_put, params, pspec)
        self.state = TrainState(
            step=jax.device_put(jnp.zeros((), jnp.int32), replicated(self.mesh)),
            params=placed,
            opt_state=jax.tree.map(jax.device_put, opt_state, osh),
            rng=jax.device_put(rng, replicated(self.mesh)),
            ema_params=(jax.tree.map(jnp.copy, placed)
                        if self.cfg.ema_decay > 0 else None),
        )
        return self.state

    def _eval_params(self):
        """Params used for evaluation / encoder transfer: the EMA weights
        when ``cfg.ema_decay > 0`` (same serve-the-smoothing policy as the
        supervised Trainer), else the raw trained params."""
        if self.state is None:
            return None
        if self.cfg.ema_decay > 0 and self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params

    def _tp_ctx(self):
        """Trace-time context mgr factory: under tensor parallelism the flash
        kernel must run through the shard_map wrap (pallas_call has no GSPMD
        partitioning rules) -- same policy as Trainer._build_steps."""
        import contextlib

        from ..ops.attention import flash_tp_context
        if (self.mesh.shape.get('model', 1) > 1
                and self.model_cfg.use_flash_attention):
            return lambda: flash_tp_context(self.mesh)
        return contextlib.nullcontext

    def _build_step(self):
        model, cfg = self.model, self.cfg
        mean, std, patch = self.mean, self.std, self.model_cfg.patch_size
        tp_ctx = self._tp_ctx()
        accum = max(1, cfg.grad_accum)

        def micro_grads(params, signals, idx_k, mask_rng, do_rng):
            """One (micro)batch: HBM-resident gather -> prep -> masked-recon
            loss + grads -- the unit the shared accumulation scan runs."""
            # resident splits may be stored sub-f32 (cfg.resident_dtype)
            sig = jnp.take(signals, idx_k, axis=0).astype(jnp.float32)
            sig = jax.lax.with_sharding_constraint(sig, P(DATA_AXIS))
            # crop after the always-pad quirk: inputs already a patch multiple
            # gain a zero patch (transform.py:148-151) that would exceed the
            # model's pos-embedding budget
            sig = _prep_batch(sig, mean, std, patch, train=False)
            sig = sig[..., :self.model_cfg.max_signal_length]

            def loss_fn(params):
                from ..models.moe import apply_with_moe
                with tp_ctx():  # trace-time: shard_map-wrap the flash kernel
                    out, aux = apply_with_moe(
                        model, params, sig, deterministic=False,
                        rngs={'mask': mask_rng, 'dropout': do_rng},
                        moe=self.model_cfg.moe_num_experts > 0)
                return out.loss + self.model_cfg.moe_aux_weight * aux, out.loss

            (_, loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return loss, grads

        def train_step(state: TrainState, signals, idx, nonfinite_count):
            # HBM-resident split + on-device index gather (same policy as
            # trainer.Trainer._step_inputs); host-streaming mode passes the
            # batch itself with an iota idx
            rng, mask_rng, do_rng = jax.random.split(state.rng, 3)
            # grad accumulation + sanitizer + optimizer + EMA all come from
            # the shared loop mechanics (train/loop.py) -- one implementation
            # across the trainer families
            loss, grads = grad_accum_scan(
                lambda p, idx_k, r: micro_grads(p, signals, idx_k, r[0], r[1]),
                state.params, idx, (mask_rng, do_rng), accum)
            if accum > 1:
                loss = loss.mean()
            new_state, grad_norm, nonfinite_count = finish_update(
                self.optimizer, cfg, state, grads, rng, nonfinite_count)
            return new_state, {'loss': loss, 'grad_norm': grad_norm,
                               'learning_rate': self.schedule(state.step)}, \
                nonfinite_count

        def eval_step(params, signals, idx, mask_rng):
            sig = jnp.take(signals, idx, axis=0).astype(jnp.float32)
            sig = jax.lax.with_sharding_constraint(sig, P(DATA_AXIS))
            sig = _prep_batch(sig, mean, std, patch, train=False)
            sig = sig[..., :self.model_cfg.max_signal_length]
            with tp_ctx():
                out = model.apply(params, sig, mask_rng=mask_rng,
                                  deterministic=True)
            return out.per_sample_loss

        with self.mesh:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 3))
            self._eval_step = jax.jit(eval_step)

    def _sig_inputs(self, data: SplitData, take: np.ndarray):
        """(signals, idx) for a jitted step -- HBM-resident when the split
        fits (same policy as Trainer._step_inputs)."""
        cap = self.cfg.hbm_split_max_bytes
        resident = (self.cfg.device_resident
                    if self.cfg.device_resident is not None
                    else data.signals.nbytes <= cap)
        if resident:
            key = id(data)
            if key not in self._resident:
                sig_dtype = jnp.dtype(self.cfg.resident_dtype or jnp.float32)
                with self.mesh:
                    self._resident[key] = jax.device_put(
                        jnp.asarray(data.signals, sig_dtype),
                        replicated(self.mesh))
                # evict on GC: id() reuse would alias a new split (see Trainer)
                weakref.finalize(data, self._resident.pop, key, None)
            return self._resident[key], jnp.asarray(take.astype(np.int32))
        return (jnp.asarray(data.signals[take], jnp.float32),
                jnp.arange(take.size, dtype=jnp.int32))

    # ------------------------------------------------------------ checkpoints
    def save_checkpoint(self, tag: str = 'final') -> str:
        from .checkpoint import save_checkpoint
        path = os.path.join(os.path.abspath(self.output_dir), f'ckpt-{tag}')
        save_checkpoint(path, self.state, extra={'epoch': self.epoch},
                        async_save=self.cfg.async_checkpoint)
        self.logger.info(f'Checkpoint saved to {path}'
                         + (' (async)' if self.cfg.async_checkpoint else ''))
        return path

    def load_checkpoint(self, path: str):
        from .checkpoint import restore_checkpoint
        if self.state is None:
            self.init_state()
        self.state, extra = restore_checkpoint(path, self.state)
        self.epoch = int(extra.get('epoch', 0))
        self._host_step = int(self.state.step)  # one sync at restore is fine
        return self.state

    def latest_checkpoint(self) -> Optional[str]:
        from .checkpoint import latest_committed_checkpoint
        return latest_committed_checkpoint(self.output_dir)

    def evaluate(self, data: Optional[SplitData] = None, seed: int = 0) -> float:
        """Held-out masked-reconstruction loss with a FIXED mask rng, so eval
        numbers are comparable across epochs/runs."""
        data = data if data is not None else self.eval_data
        assert data is not None and len(data) > 0, 'no eval data'
        if self._eval_step is None:
            self._build_step()
        if self.state is None:
            self.init_state()
        bsz = self.cfg.eval_batch_size
        losses = []
        rng = jax.random.PRNGKey(seed)
        for i in range(0, len(data), bsz):
            take = np.arange(i, min(i + bsz, len(data)))
            n_real = take.size
            if n_real < bsz:  # pad to the jitted batch shape; keep real rows
                take = np.concatenate([take, np.zeros(bsz - n_real, np.int64)])
            rng, mask_rng = jax.random.split(rng)
            sigs, take_dev = self._sig_inputs(data, take)
            with self.mesh:
                # EMA weights when tracked -- eval and early stopping judge
                # what will be served/transferred (same policy as Trainer)
                per_sample = self._eval_step(self._eval_params(), sigs,
                                             take_dev, mask_rng)
            losses.append(np.asarray(per_sample)[:n_real])
        return float(np.concatenate(losses).mean())

    def build_stream_step(self, raw_fqs: Optional[int] = None,
                          wire_scale: Optional[float] = None):
        """The jitted streaming-pretrain step: on-device fused
        resample+lowpass+normalize (when ``raw_fqs`` is set) -> masked-patch
        forward/backward -> AdamW, state donated.  Exposed so ``train_stream``
        and ``bench.py`` time the identical program."""
        from ..ops.preprocess import fused_train_path
        mean, std, patch = self.mean, self.std, self.model_cfg.patch_size
        bsharding = batch_sharding(self.mesh)
        tp_ctx = self._tp_ctx()

        def stream_step(state: TrainState, sig):
            rng, mask_rng, do_rng = jax.random.split(state.rng, 3)
            sig = jax.lax.with_sharding_constraint(sig, P(DATA_AXIS))
            if wire_scale is not None:
                sig = sig.astype(jnp.float32) / jnp.float32(wire_scale)
            if raw_fqs is not None and raw_fqs != 250:
                sig = fused_train_path(sig, mean, std, fqs=raw_fqs,
                                       target_fqs=250, patch_size=patch)
                sig = sig[..., :self.model_cfg.max_signal_length]
            else:
                sig = _prep_batch(sig, mean, std, patch, train=False)
                sig = sig[..., :self.model_cfg.max_signal_length]

            def loss_fn(params):
                from ..models.moe import apply_with_moe
                with tp_ctx():
                    out, aux = apply_with_moe(
                        self.model, params, sig, deterministic=False,
                        rngs={'mask': mask_rng, 'dropout': do_rng},
                        moe=self.model_cfg.moe_num_experts > 0)
                return out.loss + self.model_cfg.moe_aux_weight * aux, out.loss

            (_, loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            # shared update tail (optimizer + EMA); the stream loop has no
            # host sync cadence, so the sanitizer count is not threaded out
            new_state, _, _ = finish_update(self.optimizer, self.cfg, state,
                                            grads, rng, jnp.zeros((), jnp.int32))
            return new_state, loss

        with self.mesh:
            return jax.jit(stream_step, donate_argnums=(0,),
                           in_shardings=(None, bsharding))

    def train_stream(self, batches, total_steps: int, raw_fqs=None,
                     log_every: int = 50,
                     wire_scale=None,
                     ckpt_every: int = 0,
                     resume: bool = False) -> Dict[str, Any]:
        """Streaming pretrain over an iterator of raw (B, C, L) host batches
        (e.g. :class:`data.pipeline.ShardedRecordStream` over CinC21 +
        MIMIC-IV-ECG shards -- BASELINE.json config 5).

        Multi-corpus mixing: when the iterator yields ``(corpus_idx, batch)``
        pairs (:class:`data.pipeline.MixedRecordStream`), ``raw_fqs`` and
        ``wire_scale`` may be per-corpus sequences -- each corpus gets its own
        jitted step with ITS native rate fed to the fused on-device preprocess
        (steps are cached per distinct (fqs, scale) spec, so two corpora at
        the same rate share one compiled program).  The result carries
        ``mix_counts``, the realized per-corpus step counts.

        ``raw_fqs``: when given, batches are raw recordings at that rate and
        the fused resample+lowpass+normalize pipeline runs on device inside
        the jitted step (on-the-fly preprocessing, never input-bound); when
        None, batches are already on the 250 Hz grid and only normalize+pad
        apply.

        ``wire_scale``: when set, batches may be integer ADC counts (e.g.
        int16 straight from WFDB) and are converted to physical units on
        device as ``counts / wire_scale`` -- halving host->HBM traffic, which
        dominates on bandwidth-constrained hosts (StepTimer's input_fraction
        shows when this matters).

        ``ckpt_every``: save an orbax checkpoint every N steps (0 = never) --
        multi-day streaming runs survive crashes.  ``resume=True`` restores
        the latest checkpoint under output_dir and, for a deterministic
        stream, skips the already-consumed batches so the continued run is
        bit-identical to an uninterrupted one (the resumable-export ethos of
        the reference, DataExport.m:28-44, applied to the pretrain loop).
        """
        import itertools

        from ..utils.misc import StepTimer
        cfg = self.cfg
        start_step = 0
        if resume:
            # True -> newest committed checkpoint under output_dir;
            # a string -> that specific checkpoint (mirrors train())
            path = resume if isinstance(resume, str) else self.latest_checkpoint()
            if path:
                self.load_checkpoint(path)
                start_step = int(self.state.step)
                self.logger.info(f'Resumed streaming pretrain from {path} '
                                 f'(step {start_step})')
        if self.state is None:
            self.init_state()
        if ckpt_every:
            os.makedirs(self.output_dir, exist_ok=True)
        from .checkpoint import prune_checkpoints

        def _per_corpus(v, ci):
            return v[ci] if isinstance(v, (list, tuple)) else v

        step_fns: Dict[Any, Any] = {}

        def step_for(ci: int):
            key = (_per_corpus(raw_fqs, ci), _per_corpus(wire_scale, ci))
            if key not in step_fns:
                step_fns[key] = self.build_stream_step(raw_fqs=key[0],
                                                       wire_scale=key[1])
            return step_fns[key]

        timer = StepTimer()
        last_loss = float('nan')
        host_step = start_step
        saved_at = -1
        mix_counts: Dict[int, int] = {}
        for item in itertools.islice(batches, start_step, total_steps):
            ci, batch = item if isinstance(item, tuple) else (0, item)
            sig = jnp.asarray(batch)
            timer.input_done()
            with self.mesh:
                self.state, loss = step_for(ci)(self.state, sig)
            timer.step_done()
            mix_counts[ci] = mix_counts.get(ci, 0) + 1
            host_step += 1
            if host_step % log_every == 0 or host_step == total_steps:
                last_loss = float(loss)
                self.logger.info({'pretrain/loss': last_loss, 'step': host_step,
                                  **timer.summary()})
            if ckpt_every and host_step % ckpt_every == 0:
                # step-tagged: each save targets a FRESH path, so a crash
                # mid-write never deletes the previous committed checkpoint
                # (a single force-overwritten tag had a zero-restorable
                # window); prune keeps the newest two
                self.save_checkpoint(tag=f'step{host_step}')
                prune_checkpoints(self.output_dir, keep=2)
                saved_at = host_step
        self._host_step = host_step
        if ckpt_every and host_step != saved_at:
            self.save_checkpoint(tag=f'step{host_step}')
            prune_checkpoints(self.output_dir, keep=2)
        if self.cfg.async_checkpoint:
            from .checkpoint import wait_for_checkpoints
            wait_for_checkpoints()
        return {'loss': last_loss, 'steps': host_step,
                'mix_counts': {int(k): v for k, v in sorted(mix_counts.items())},
                'timer': timer.summary()}

    def train(self, resume: bool = False) -> Dict[str, Any]:
        """Epoch-loop pretraining with eval epochs, early stopping, periodic /
        best / final checkpoints, and checkpoint-based resume -- the same
        failure-recovery surface as the supervised Trainer (trainer.py)."""
        cfg = self.cfg
        os.makedirs(self.output_dir, exist_ok=True)
        if resume:
            path = resume if isinstance(resume, str) else self.latest_checkpoint()
            if path:
                self.load_checkpoint(path)
                self.logger.info(f'Resumed from {path} (epoch {self.epoch})')
        tb = TbWriter(os.path.join(self.output_dir, 'tb'))
        # triple sink like the supervised Trainer: colored console + plain
        # file + TensorBoard (reference train.py:380-397)
        logger_fl = get_logger('EcgMae PretrainFile',
                               file_path=os.path.join(self.output_dir, 'pretrain.log'))
        if self.state is None:
            self.init_state()
        if self._train_step is None:
            self._build_step()
        host_rng = np.random.default_rng(cfg.seed)
        n = len(self.train_data)
        t0 = time.time()
        last_loss = None
        best_eval_loss, n_bad_ep = float('inf'), 0
        eval_history = []
        nonfinite = jnp.zeros((), jnp.int32)
        for _ in range(self.epoch, cfg.num_train_epoch):
            self.epoch += 1
            idx = np.arange(n)
            host_rng.shuffle(idx)
            stop = (n // cfg.train_batch_size) * cfg.train_batch_size
            for i in range(0, stop, cfg.train_batch_size):
                take = idx[i:i + cfg.train_batch_size]
                sigs, take_dev = self._sig_inputs(self.train_data, take)
                with self.mesh:
                    self.state, metrics, nonfinite = self._train_step(
                        self.state, sigs, take_dev, nonfinite)
                self._host_step += 1
                step = self._host_step
                if step % max(1, self.steps_per_epoch // 4) == 0:
                    if cfg.debug_nans and int(nonfinite) > 0:
                        raise FloatingPointError(
                            f'non-finite gradient norm by step {step} '
                            f'({int(nonfinite)} bad steps; params unpoisoned)')
                    last_loss = float(metrics['loss'])
                    payload = {'pretrain/loss': last_loss,
                               'pretrain/lr': float(metrics['learning_rate']),
                               'pretrain/grad_norm': float(metrics['grad_norm']),
                               'epoch': self.epoch, 'step': step}
                    # objective-specific extras (e.g. the contrastive
                    # trainer's top-1 retrieval accuracy) flow to all sinks
                    payload.update({
                        f'pretrain/{k}': float(v) for k, v in metrics.items()
                        if k not in ('loss', 'learning_rate', 'grad_norm')})
                    self.logger.info(str(payload))
                    logger_fl.info(str(payload))
                    tb.log(payload, step)
            if cfg.debug_nans and int(nonfinite) > 0:
                # epoch-end check covers throttled-logging configs
                raise FloatingPointError(
                    f'non-finite gradient norm during epoch {self.epoch} '
                    f'({int(nonfinite)} bad steps; params unpoisoned)')
            if cfg.save_every_n_epoch and self.epoch % cfg.save_every_n_epoch == 0:
                self.save_checkpoint(tag=f'ep{self.epoch}')
            if cfg.do_eval and self.eval_data is not None and len(self.eval_data):
                ev = self.evaluate()
                eval_history.append(ev)
                payload = {'pretrain/eval_loss': ev, 'epoch': self.epoch,
                           'step': self._host_step}
                self.logger.info(str(payload))
                logger_fl.info(str(payload))
                tb.log(payload, self._host_step)
                if ev < best_eval_loss:
                    best_eval_loss, n_bad_ep = ev, 0
                    self.save_checkpoint(tag='best')
                else:
                    n_bad_ep += 1
                if n_bad_ep >= cfg.patience:
                    self.logger.info(f'Pretraining stopped early at epoch '
                                     f'{self.epoch} (patience {cfg.patience})')
                    break
        tb.close()
        if last_loss is None and self.state is not None:
            last_loss = float('nan')
        path = self.save_checkpoint(tag='final') if self.cfg.save_final else None
        if self.cfg.async_checkpoint:
            from .checkpoint import wait_for_checkpoints
            wait_for_checkpoints()   # all saves durable before returning
        return {'loss': last_loss, 'epochs': self.epoch,
                'eval_history': eval_history,
                'best_eval_loss': best_eval_loss if eval_history else None,
                'seconds': time.time() - t0, 'checkpoint': path}


# ---------------------------------------------------------------------------
# Pretrained-encoder transfer
# ---------------------------------------------------------------------------
def transfer_encoder(mae_params, vit_params):
    """Copy the MAE encoder trunk into an ``EcgVit`` param tree.

    Name map: encoder_patch_embed -> encoder/patch_embed,
    encoder_block_i -> encoder/block_i, encoder_norm -> encoder/final_norm,
    encoder_pos_embed (P, H) -> rows 1..P of the classifier pos_embed (cls row
    keeps its init).  Head / cls-token stay at their fresh init.
    """
    import flax
    mae_p = flax.core.unfreeze(mae_params)['params']
    vit_p = flax.core.unfreeze(vit_params)
    enc = vit_p['params']['encoder']
    enc['patch_embed'] = mae_p['encoder_patch_embed']
    for name, sub in mae_p.items():
        if name.startswith('encoder_block_'):
            enc[name.replace('encoder_', '')] = sub
    enc['final_norm'] = mae_p['encoder_norm']
    pos = np.array(enc['pos_embed'])  # copy: jax arrays view as read-only
    mae_pos = np.asarray(mae_p['encoder_pos_embed'])
    pos[:, 1:1 + mae_pos.shape[1]] = mae_pos
    enc['pos_embed'] = jnp.asarray(pos)
    return flax.core.freeze(vit_p) if isinstance(vit_params, flax.core.FrozenDict) else vit_p


def linear_probe_mask(params):
    """optax mask: True (trainable) only for the classification head --
    linear-probe protocol on a frozen pretrained trunk."""
    def mask_fn(path, _):
        keys = '/'.join(getattr(k, 'key', str(k)) for k in path)
        return 'head' in keys
    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_probe_optimizer(cfg: TrainConfig, total_steps: int, params):
    """AdamW on the head only; trunk params get zero updates.  Built on the
    optax chain (not FusedAdamW): optax.masked needs the transform interface,
    and the probe trains ~0.06% of the params, so update cost is nil."""
    opt, sched = make_optimizer(
        dataclasses.replace(cfg, fused_optimizer=False), total_steps)
    mask = linear_probe_mask(params)
    frozen = optax.masked(optax.set_to_zero(), jax.tree.map(lambda m: not m, mask))
    return optax.chain(opt, frozen), sched


def load_pretrained_encoder(path: str, model_cfg: VitConfig,
                            mae_cfg: Optional[MaeConfig] = None):
    """Restore an MAE checkpoint (``cli pretrain`` / ``MaeTrainer`` output) and
    return its param tree, ready for :func:`transfer_encoder` into an
    ``EcgVit``.  ``mae_cfg`` only shapes the decoder template; any checkpoint
    written with the default decoder restores with the default."""
    tr = MaeTrainer(model_cfg, mae_cfg or MaeConfig(), TrainConfig())
    tr.init_state()
    tr.load_checkpoint(path)
    return tr.state.params
