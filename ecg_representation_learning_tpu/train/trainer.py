"""The training/evaluation harness: sharded jitted steps + the outer loop.

Rebuilds the reference's hand-rolled ``MyTrainer`` (models/train.py:195-404)
TPU-first:

  * one donated, jitted train step: gather minibatch rows from the
    HBM-resident split -> fused normalize + pad + (train-only) TimeOut ->
    forward -> BCE -> grad -> global-norm clip -> AdamW update, all one XLA
    program (the reference instead reads HDF5 per item per step with zero
    workers -- dataset.py:93, ptb_dataset.py:87);
  * data parallelism via the ('data','model') mesh: batches sharded over
    'data', gradient all-reduce inserted by GSPMD (SURVEY.md §2.3);
  * eval epochs with loss_reduction 'mean'/'none' (train.py:321-378), device
    binary stats + host macro-AUROC (util/train.py:12-56 semantics);
  * early stopping on eval loss with ``patience`` (train.py:301-314);
  * gradient accumulation (``cfg.grad_accum``: scanned microbatches, one
    averaged update) and an on-device parameter EMA (``cfg.ema_decay``,
    checkpointed; eval/inference serve the EMA weights);
  * orbax checkpoints of (params, opt_state, step, rng) with exact resume --
    fixing the reference's no-optimizer-state, no-resume gap (SURVEY.md §5);
  * console + file + TensorBoard triple logging sink (train.py:380-397).
"""
from __future__ import annotations

import dataclasses
import datetime
import functools
import os
import time
import weakref
from typing import Any, Dict, Iterator, Optional, Tuple, Union

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..configs import TrainConfig, VitConfig
from ..models.vit import EcgVit, bce_with_logits
from ..ops.augment import timeout as timeout_op
from ..ops.pad import time_end_pad
from ..parallel.mesh import (DATA_AXIS, make_mesh, opt_state_shardings,
                             param_shardings, replicated)
from ..utils.logging import TbWriter, get_logger, pretty_log_dict
from .metrics import (binary_stats, classification_report, multilabel_auroc,
                      per_class_recall)
from .loop import finish_update, grad_accum_scan
from .optim import FusedAdamW, apply_optimizer, make_optimizer


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    # EMA of the params (cfg.ema_decay > 0); None adds no pytree leaves, so
    # the state structure -- and old checkpoints -- are unchanged when off
    ema_params: Any = None


@dataclasses.dataclass
class SplitData:
    """One split, host- or device-resident: raw signals + multi-hot labels."""
    signals: np.ndarray   # (N, C, L) float32, unnormalized (raw 250 Hz grid)
    labels: np.ndarray    # (N, num_class) float32 multi-hot

    def __len__(self):
        return self.signals.shape[0]


def _prep_batch(sig, mean, std, patch_size, train: bool, rng=None,
                timeout_scale=(0.0, 0.5)):
    """Fused on-device per-batch transform: normalize -> pad -> TimeOut."""
    sig = (sig - mean.reshape((-1, 1))) / std.reshape((-1, 1))
    sig = time_end_pad(sig, patch_size)
    if train and rng is not None:
        sig = timeout_op(rng, sig, *timeout_scale)
    return sig


class Trainer:
    """Supervised multi-label trainer (the reference MyTrainer equivalent)."""

    def __init__(
        self,
        model_cfg: VitConfig,
        train_cfg: TrainConfig,
        train_data: Optional[SplitData] = None,
        eval_data: Optional[SplitData] = None,
        norm_stats: Optional[Dict[str, Any]] = None,
        output_dir: Optional[str] = None,
        mesh=None,
        name: str = 'EcgVit',
    ):
        # under tensor parallelism the flash kernel stays ACTIVE: attention()
        # routes through a shard_map wrap (flash_tp_context in _build_steps)
        # since pallas_call has no GSPMD partitioning rules of its own
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        self.model = EcgVit(model_cfg)
        self.train_data, self.eval_data = train_data, eval_data
        stats = norm_stats or {'mean': [0.0] * model_cfg.num_channels,
                               'std': [1.0] * model_cfg.num_channels}
        self.mean = jnp.asarray(stats['mean'], jnp.float32)
        self.std = jnp.asarray(stats['std'], jnp.float32)

        self.mesh = mesh if mesh is not None else make_mesh(
            n_data=train_cfg.mesh_data, n_model=train_cfg.mesh_model)
        if train_cfg.jax_debug_nans:
            jax.config.update('jax_debug_nans', True)
        jax.config.update('jax_default_prng_impl', train_cfg.prng_impl)
        self.name = name
        self.save_time = datetime.datetime.now().strftime('%Y-%m-%d_%H-%M-%S')
        self.output_dir = output_dir or os.path.join('runs', self.save_time)

        assert train_cfg.train_batch_size % max(1, train_cfg.grad_accum) == 0, \
            (train_cfg.train_batch_size, train_cfg.grad_accum)
        n_train = len(train_data) if train_data is not None else 1
        self.steps_per_epoch = train_cfg.steps_per_epoch(n_train)
        self.total_steps = train_cfg.total_steps(n_train)
        self.optimizer, self.schedule = make_optimizer(train_cfg, self.total_steps)

        self.state: Optional[TrainState] = None
        self.epoch = 0
        self._host_step = 0  # mirrors state.step without device syncs
        self._resident = {}  # id(SplitData) -> (signals, labels) in HBM
        self._train_step = None
        self._multi_step = None
        self._epoch_step = None
        self._eval_step = None
        self._eval_step_int8 = None
        self._int8 = None   # (int8 param tree, scales) via enable_int8_inference
        self.logger = get_logger(f'{name} Train')
        self.logger_fl = None
        self.tb = None

    # ------------------------------------------------------------------ setup
    def _finalize_optimizer(self, params):
        """Wrap the optimizer with the linear-probe mask (head-only updates)
        once a param tree exists; idempotent."""
        if self.cfg.linear_probe and not getattr(self, '_probe_applied', False):
            from .pretrain import linear_probe_mask
            if isinstance(self.optimizer, FusedAdamW):
                # optax.masked needs the transform interface; the probe
                # trains ~0.06% of params so fused update cost is irrelevant
                self.optimizer, self.schedule = make_optimizer(
                    dataclasses.replace(self.cfg, fused_optimizer=False),
                    self.total_steps)
            mask = linear_probe_mask(params)
            frozen = optax.masked(optax.set_to_zero(),
                                  jax.tree.map(lambda m: not m, mask))
            self.optimizer = optax.chain(self.optimizer, frozen)
            self._probe_applied = True

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        rng, init_rng = jax.random.split(rng)
        dummy = jnp.zeros((1, self.model_cfg.num_channels,
                           self.model_cfg.max_signal_length), jnp.float32)
        variables = self.model.init({'params': init_rng}, dummy)
        # MoE models also init the sown 'moe' aux-loss collection -- the
        # train state carries learnable params only
        params = ({'params': variables['params']}
                  if set(variables) != {'params'} else variables)
        self._finalize_optimizer(params)
        opt_state = self.optimizer.init(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=opt_state, rng=rng)
        # place on mesh: params/opt_state per partition rules (incl. optional
        # ZeRO-style 'data'-axis sharding of params + Adam moments under
        # cfg.fsdp), scalars replicated
        pspec = param_shardings(params, self.mesh, fsdp=self.cfg.fsdp)
        osh = opt_state_shardings(opt_state, pspec, self.mesh)
        placed = jax.tree.map(jax.device_put, params, pspec)
        state = TrainState(
            step=jax.device_put(state.step, replicated(self.mesh)),
            params=placed,
            opt_state=jax.tree.map(jax.device_put, opt_state, osh),
            rng=jax.device_put(state.rng, replicated(self.mesh)),
            # EMA starts at the init params, sharded like them
            ema_params=(jax.tree.map(jnp.copy, placed)
                        if self.cfg.ema_decay > 0 else None),
        )
        self.state = state
        return state

    def set_params(self, params):
        """Install an externally-built param tree (e.g. a reference torch
        checkpoint ported via models/port.py), re-initializing the optimizer
        state.  Params are placed on the mesh per the partition rules."""
        if self.state is None:
            self.init_state()
        pspec = param_shardings(params, self.mesh, fsdp=self.cfg.fsdp)
        params = jax.tree.map(
            lambda a, s: jax.device_put(jnp.asarray(a), s), params, pspec)
        self._finalize_optimizer(params)
        self.state = self.state.replace(
            params=params,
            opt_state=self.optimizer.init(params),
            # re-seed the EMA: leaving it on the discarded init weights would
            # make every eval/early-stop/best-ckpt decision score near-random
            # params for ~1/(1-decay) steps
            ema_params=(jax.tree.map(jnp.copy, params)
                        if self.state.ema_params is not None else None))
        self._refresh_int8()
        return self.state

    def _refresh_int8(self) -> None:
        """Re-quantize the int8 inference snapshot after a weight swap
        (set_params/load_checkpoint) so quantized serving never dispatches
        stale weights."""
        if self._int8 is not None:
            self.enable_int8_inference()

    def _build_steps(self):
        import contextlib

        from ..ops.attention import flash_tp_context
        model, cfg = self.model, self.cfg
        mean, std = self.mean, self.std
        patch = self.model_cfg.patch_size
        if (self.mesh.shape.get('model', 1) > 1
                and self.model_cfg.use_flash_attention):
            tp_ctx = lambda: flash_tp_context(self.mesh)
        else:
            tp_ctx = contextlib.nullcontext

        accum = max(1, cfg.grad_accum)

        def micro_grads(params, signals, labels, idx_k, to_rng, do_rng):
            """Gather one (micro)batch from the HBM-resident split, prep it,
            and return (loss, logits, labels) + grads -- the unit the shared
            accumulation scan (loop.grad_accum_scan) runs."""
            # resident splits may be stored sub-f32 (cfg.resident_dtype);
            # normalization and loss math always run in f32
            sig = jnp.take(signals, idx_k, axis=0).astype(jnp.float32)
            lab = jnp.take(labels, idx_k, axis=0)
            sig = jax.lax.with_sharding_constraint(sig, P(DATA_AXIS))
            lab = jax.lax.with_sharding_constraint(lab, P(DATA_AXIS))
            sig = _prep_batch(sig, mean, std, patch, train=cfg.augment_timeout,
                              rng=to_rng)

            def loss_fn(params):
                from ..models.moe import apply_with_moe
                with tp_ctx():   # trace-time: shard_map-wrap the flash kernel
                    out, aux = apply_with_moe(
                        model, params, sig, labels=lab, deterministic=False,
                        loss_weight=cfg.loss_weight, rngs={'dropout': do_rng},
                        moe=self.model_cfg.moe_num_experts > 0)
                # task loss drives metrics; the Switch load-balance aux joins
                # the objective only (keeps 'loss' comparable to dense runs)
                total = out.loss + self.model_cfg.moe_aux_weight * aux
                return total, (out.loss, out.logits, lab)

            (_, aux_out), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return aux_out, grads

        def train_step(state: TrainState, signals, labels, idx, nonfinite_count):
            # the split lives in HBM (replicated); each step ships only a
            # (bsz,) int32 index vector and gathers rows ON DEVICE -- no
            # per-step host->device batch transfer.  (Host-streaming mode
            # passes the batch itself with an iota idx -- same program.)
            rng, to_rng, do_rng = jax.random.split(state.rng, 3)
            # gradient accumulation via the shared scan (train/loop.py):
            # grads summed into a params-shaped carry (activation memory is
            # one microbatch's), ONE optimizer update on the mean -- same
            # effective batch and schedule as accum=1
            (loss, logits, lab), grads = grad_accum_scan(
                lambda p, idx_k, r: micro_grads(p, signals, labels,
                                                idx_k, r[0], r[1]),
                state.params, idx, (to_rng, do_rng), accum)
            if accum > 1:   # stacked microbatch aux -> flat batch
                loss = loss.mean()
                logits = logits.reshape(-1, logits.shape[-1])
                lab = lab.reshape(-1, lab.shape[-1])
            # shared update tail: sanitizer -> optimizer -> EMA (loop.py)
            new_state, grad_norm, nonfinite_count = finish_update(
                self.optimizer, cfg, state, grads, rng, nonfinite_count)
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
            metrics = {'loss': loss, 'learning_rate': self.schedule(state.step),
                       'grad_norm': grad_norm, **binary_stats(probs, lab)}
            return new_state, metrics, probs, nonfinite_count

        def eval_step(params, signals, labels, idx):
            sig = jnp.take(signals, idx, axis=0).astype(jnp.float32)
            lab = jnp.take(labels, idx, axis=0)
            sig = jax.lax.with_sharding_constraint(sig, P(DATA_AXIS))
            lab = jax.lax.with_sharding_constraint(lab, P(DATA_AXIS))
            sig = _prep_batch(sig, mean, std, patch, train=False)
            with tp_ctx():
                out = model.apply(params, sig, labels=lab, loss_reduction='none')
            probs = jax.nn.sigmoid(out.logits.astype(jnp.float32))
            return out.loss, probs

        def multi_step(state: TrainState, signals, labels, idx_mat,
                       nonfinite_count):
            # K steps unrolled into one dispatch (cfg.steps_per_dispatch):
            # pure dataflow chaining -- no while-loop carry, so XLA aliases
            # the state buffers across the chained updates; the per-dispatch
            # runtime input walk (PERF.md: ~10 ms per 2.6 GB resident split
            # on the tunneled chip) is paid once per K steps.
            losses, gnorms = [], []
            metrics = None
            for k in range(idx_mat.shape[0]):   # static K at trace time
                state, metrics, _, nonfinite_count = train_step(
                    state, signals, labels, idx_mat[k], nonfinite_count)
                losses.append(metrics['loss'])
                gnorms.append(metrics['grad_norm'])
            return (state, jnp.stack(losses), jnp.stack(gnorms), metrics,
                    nonfinite_count)

        def epoch_step(state: TrainState, signals, labels, idx_mat,
                       nonfinite_count):
            # the whole epoch as ONE dispatch (cfg.epoch_scan): lax.scan over
            # the identical step body, batches gathered per scan iteration
            # from the HBM-resident split by the (steps, bsz) index matrix.
            # probs/binary-stats outputs are unused here, so XLA dead-code
            # eliminates them; rng evolution matches the per-step loop
            # bit-exactly (same splits, same order).
            def body(carry, idx):
                st, nf = carry
                st, metrics, _, nf = train_step(st, signals, labels, idx, nf)
                return (st, nf), (metrics['loss'], metrics['grad_norm'])

            (state, nonfinite_count), (losses, gnorms) = jax.lax.scan(
                body, (state, nonfinite_count), idx_mat)
            return state, losses, gnorms, nonfinite_count

        def eval_step_int8(qparams, scales, signals, labels, idx):
            # weight-only int8 serving: dequant INSIDE the program, fused by
            # XLA into each matmul's operand read (models/quantize.py)
            from ..models.quantize import dequantize_params
            return eval_step(dequantize_params(qparams, scales),
                             signals, labels, idx)

        with self.mesh:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 4))
            self._multi_step = jax.jit(multi_step, donate_argnums=(0, 4))
            self._epoch_step = jax.jit(epoch_step, donate_argnums=(0, 4))
            self._eval_step = jax.jit(eval_step)
            self._eval_step_int8 = jax.jit(eval_step_int8)

    # ------------------------------------------------------------------ loops
    def _index_batches(self, data: SplitData, batch_size: int, shuffle_rng=None,
                       drop_last: bool = True) -> Iterator[Tuple[np.ndarray, int]]:
        n = len(data)
        idx = np.arange(n)
        if shuffle_rng is not None:
            shuffle_rng.shuffle(idx)
        stop = (n // batch_size) * batch_size if drop_last else n
        for i in range(0, max(stop, 0), batch_size):
            take = idx[i:i + batch_size]
            n_real = take.size
            if n_real < batch_size:  # pad final eval batch; mask on host
                take = np.concatenate([take, np.zeros(batch_size - n_real, np.int64)])
            yield take, n_real

    def _split_arrays(self, data: SplitData):
        """The split as device arrays: HBM-resident (replicated over the mesh)
        when it fits, so steps gather rows on device from a (bsz,) index
        vector instead of shipping the batch from host every step.  Falls back
        to host arrays (per-batch transfer) above the size cap."""
        cap = self.cfg.hbm_split_max_bytes
        resident = (self.cfg.device_resident
                    if self.cfg.device_resident is not None
                    else data.signals.nbytes + data.labels.nbytes <= cap)
        if not resident:
            return None
        key = id(data)
        if key not in self._resident:
            rep = replicated(self.mesh)
            sig_dtype = jnp.dtype(self.cfg.resident_dtype or jnp.float32)
            with self.mesh:
                self._resident[key] = (
                    jax.device_put(jnp.asarray(data.signals, sig_dtype), rep),
                    jax.device_put(jnp.asarray(data.labels, jnp.float32), rep))
            # evict on GC of the SplitData: id() values are reused, so a dead
            # entry could alias a NEW split at the same address (silent wrong
            # data) and distinct splits would otherwise pin HBM forever
            weakref.finalize(data, self._resident.pop, key, None)
        return self._resident[key]

    def _step_inputs(self, data: SplitData, take: np.ndarray):
        """(signals, labels, idx) for a jitted step: HBM-resident mode passes
        the full split + the real index vector; host-streaming mode passes
        the sliced batch + iota indices (the same program modulo the leading
        dim)."""
        dev = self._split_arrays(data)
        if dev is not None:
            sigs, labs = dev
            idx = jnp.asarray(take.astype(np.int32))
        else:
            sigs = jnp.asarray(data.signals[take], jnp.float32)
            labs = jnp.asarray(data.labels[take], jnp.float32)
            idx = jnp.arange(take.size, dtype=jnp.int32)
        return sigs, labs, idx

    def latest_checkpoint(self) -> Optional[str]:
        """Most recent COMMITTED ``ckpt-*`` under output_dir (crash-recovery
        restart; orbax tmp dirs from a kill mid-save are skipped)."""
        from .checkpoint import latest_committed_checkpoint
        return latest_committed_checkpoint(self.output_dir)

    def train(self, resume: Union[bool, str] = False) -> Dict[str, Any]:
        """Run the training loop.  ``resume``: True restarts from the latest
        checkpoint in output_dir if one exists (checkpoint-based failure
        recovery -- the reference had none, SURVEY.md §5); a string restores
        that specific checkpoint path."""
        cfg = self.cfg
        os.makedirs(self.output_dir, exist_ok=True)
        if resume:
            path = resume if isinstance(resume, str) else self.latest_checkpoint()
            if path:
                self.load_checkpoint(path)
                self.logger.info(f'Resumed from {path} (epoch {self.epoch})')
        self.logger_fl = get_logger(f'{self.name} TrainFile',
                                    file_path=os.path.join(self.output_dir, 'train.log'))
        self.tb = TbWriter(os.path.join(self.output_dir, 'tb'))
        if self.state is None:
            self.init_state()
        if self._train_step is None:
            self._build_steps()
        self.logger.info(
            f'Launched training {self.model_cfg.meta} with {dataclasses.asdict(cfg)}')

        host_rng = np.random.default_rng(cfg.seed)
        best_eval_loss, n_bad_ep = float('inf'), 0
        t_start = time.time()
        history = []
        nonfinite = jnp.zeros((), jnp.int32)
        if cfg.do_eval and self.eval_data is not None:
            self._log_epoch(self.evaluate(self.eval_data), prefix='eval')
        start_epoch = self.epoch
        epoch_scan = cfg.epoch_scan
        chunked = cfg.steps_per_dispatch > 1 and not epoch_scan
        if (epoch_scan or chunked) and (
                self._split_arrays(self.train_data) is None
                or self.steps_per_epoch * cfg.train_batch_size
                > len(self.train_data)):
            self.logger.info('epoch_scan/steps_per_dispatch requested but the '
                             'train split is not device-resident (or smaller '
                             'than one batch); falling back to the per-step loop')
            epoch_scan = chunked = False
        for _ in range(start_epoch, cfg.num_train_epoch):
            self.epoch += 1
            if epoch_scan:
                nonfinite = self._train_epoch_scanned(host_rng, nonfinite)
            elif chunked:
                nonfinite = self._train_epoch_chunked(host_rng, nonfinite)
            else:
                for take, _ in self._index_batches(self.train_data,
                                                   cfg.train_batch_size,
                                                   shuffle_rng=host_rng):
                    sigs, labs, idx = self._step_inputs(self.train_data, take)
                    with self.mesh:
                        self.state, metrics, probs, nonfinite = self._train_step(
                            self.state, sigs, labs, idx, nonfinite)
                    # host-side step counter: fetching state.step would sync
                    # the device every step (~35 ms on the tunneled platform)
                    self._host_step += 1
                    step = self._host_step
                    if (not cfg.log_per_epoch) or step % self.steps_per_epoch == 0:
                        payload = {f'train/{k}': float(v)
                                   for k, v in metrics.items()}
                        payload.update(epoch=self.epoch, step=step)
                        if cfg.debug_nans and int(nonfinite) > 0:
                            # reference grad-clip error_if_nonfinite
                            # (train.py:281); the on-device counter catches
                            # every step regardless of log cadence, raised
                            # here at the sync point
                            raise FloatingPointError(
                                f'non-finite gradient norm by step {step} '
                                f'({int(nonfinite)} bad steps; params unpoisoned)')
                        self._log(payload)
            if cfg.debug_nans and int(nonfinite) > 0:
                # epoch-end check covers throttled-logging configs
                raise FloatingPointError(
                    f'non-finite gradient norm during epoch {self.epoch} '
                    f'({int(nonfinite)} bad steps; params unpoisoned)')
            if cfg.save_every_n_epoch and self.epoch % cfg.save_every_n_epoch == 0:
                self.save_checkpoint(tag=f'ep{self.epoch}')
            if cfg.do_eval and self.eval_data is not None:
                eval_metrics = self.evaluate(self.eval_data)
                self._log_epoch(eval_metrics, prefix='eval')
                history.append(eval_metrics)
                eval_loss = eval_metrics['loss']
                if eval_loss < best_eval_loss:
                    best_eval_loss, n_bad_ep = eval_loss, 0
                    self.save_checkpoint(tag='best')  # PL save_top_k analog
                else:
                    n_bad_ep += 1
                if n_bad_ep >= cfg.patience:
                    self.logger.info(
                        f'Training terminated early at epoch {self.epoch} '
                        f'(patience {cfg.patience}, best eval loss {best_eval_loss:.4f})')
                    break
        if cfg.save_final:
            self.save_checkpoint(tag='final')
        if cfg.async_checkpoint:
            from .checkpoint import wait_for_checkpoints
            wait_for_checkpoints()   # all saves durable before train() returns
        dt = time.time() - t_start
        self.logger.info(f'Training completed in {dt:.1f}s')
        if self.tb:
            self.tb.close()
        return {'best_eval_loss': best_eval_loss, 'history': history,
                'epochs': self.epoch, 'seconds': dt}

    def _train_epoch_scanned(self, host_rng, nonfinite):
        """One epoch as a single jitted dispatch (cfg.epoch_scan): shuffle on
        host exactly like the per-step loop, ship ONE (steps, bsz) int32 index
        matrix, scan the train step over it on device.  Returns the updated
        non-finite counter; logs the epoch summary plus the per-step loss
        curve to TensorBoard."""
        cfg = self.cfg
        sigs, labs = self._split_arrays(self.train_data)
        n = len(self.train_data)
        idx = np.arange(n)
        host_rng.shuffle(idx)  # same draw as _index_batches -> same batches
        n_use = self.steps_per_epoch * cfg.train_batch_size
        idx_mat = jnp.asarray(idx[:n_use].astype(np.int32).reshape(
            self.steps_per_epoch, cfg.train_batch_size))
        with self.mesh:
            self.state, losses, gnorms, nonfinite = self._epoch_step(
                self.state, sigs, labs, idx_mat, nonfinite)
        self._host_step += self.steps_per_epoch
        losses = np.asarray(losses)          # epoch-end sync (one fetch)
        gnorms = np.asarray(gnorms)
        if cfg.debug_nans and int(nonfinite) > 0:
            raise FloatingPointError(
                f'non-finite gradient norm during epoch {self.epoch} '
                f'({int(nonfinite)} bad steps; params unpoisoned)')
        if self.tb:  # per-step curve, recorded at epoch end
            first = self._host_step - self.steps_per_epoch + 1
            for i, (l, g) in enumerate(zip(losses, gnorms)):
                self.tb.log({'train/loss': float(l),
                             'train/grad_norm': float(g)}, step=first + i)
        payload = {'train/loss': float(losses[-1]),
                   'train/loss_epoch_mean': float(losses.mean()),
                   'train/grad_norm': float(gnorms[-1]),
                   'train/learning_rate': float(self.schedule(self._host_step - 1)),
                   'epoch': self.epoch, 'step': self._host_step}
        pretty = pretty_log_dict(payload)
        if cfg.log_to_console:
            self.logger.info(str(pretty))
        if self.logger_fl:
            self.logger_fl.info(str(pretty))
        return nonfinite

    def _train_epoch_chunked(self, host_rng, nonfinite):
        """One epoch dispatched K steps at a time (cfg.steps_per_dispatch):
        the shuffle draw and rng evolution match the per-step loop bit-exactly;
        leftover steps (steps_per_epoch % K) run through the single-step
        program, so only two programs ever compile.  Logging: one payload per
        dispatch (last step's metrics) unless log_per_epoch throttles to the
        epoch boundary."""
        cfg = self.cfg
        k = cfg.steps_per_dispatch
        sigs, labs = self._split_arrays(self.train_data)
        bsz = cfg.train_batch_size
        idx = np.arange(len(self.train_data))
        host_rng.shuffle(idx)  # same draw as _index_batches -> same batches
        steps = self.steps_per_epoch
        n_chunks, leftover = divmod(steps, k)
        ep_losses, ep_gnorms = [], []
        pos = 0
        for _ in range(n_chunks):
            take = idx[pos:pos + k * bsz].astype(np.int32).reshape(k, bsz)
            pos += k * bsz
            with self.mesh:
                (self.state, losses, gnorms, metrics,
                 nonfinite) = self._multi_step(self.state, sigs, labs,
                                               jnp.asarray(take), nonfinite)
            self._host_step += k
            ep_losses.append(losses)
            ep_gnorms.append(gnorms)
            if not cfg.log_per_epoch:
                payload = {f'train/{key}': float(v)
                           for key, v in metrics.items()}
                payload.update(epoch=self.epoch, step=self._host_step)
                if cfg.debug_nans and int(nonfinite) > 0:
                    raise FloatingPointError(
                        f'non-finite gradient norm by step {self._host_step} '
                        f'({int(nonfinite)} bad steps; params unpoisoned)')
                self._log(payload)
        for _ in range(leftover):
            take = idx[pos:pos + bsz]
            pos += bsz
            idx_dev = jnp.asarray(take.astype(np.int32))
            with self.mesh:
                self.state, metrics, _, nonfinite = self._train_step(
                    self.state, sigs, labs, idx_dev, nonfinite)
            self._host_step += 1
            if not cfg.log_per_epoch:
                payload = {f'train/{key}': float(v)
                           for key, v in metrics.items()}
                payload.update(epoch=self.epoch, step=self._host_step)
                self._log(payload)
        if cfg.log_per_epoch:
            losses = np.concatenate([np.asarray(l) for l in ep_losses]) \
                if ep_losses else np.zeros(0)
            if cfg.debug_nans and int(nonfinite) > 0:
                raise FloatingPointError(
                    f'non-finite gradient norm during epoch {self.epoch} '
                    f'({int(nonfinite)} bad steps; params unpoisoned)')
            payload = {'train/loss': float(metrics['loss']),
                       'train/grad_norm': float(metrics['grad_norm']),
                       'train/learning_rate':
                           float(self.schedule(self._host_step - 1)),
                       'epoch': self.epoch, 'step': self._host_step}
            if losses.size:
                payload['train/loss_epoch_mean'] = float(losses.mean())
            self._log(payload)
        return nonfinite

    def evaluate(self, data: SplitData, loss_reduction: str = 'mean',
                 return_predictions: bool = False) -> Dict[str, Any]:
        """Eval pass (reference train.py:321-378): per-sample losses, sigmoid
        probs, binary stats + macro/per-class AUROC."""
        if self._eval_step is None:
            self._build_steps()
        params = self._eval_params()
        assert params is not None, 'call init_state() or load a checkpoint first'
        assert len(data) > 0, \
            'evaluate() called on an empty split (e.g. a tiny corpus whose ' \
            'strat_fold draw left fold 9/10 empty)'
        losses, probs_all, labels_all = [], [], []
        for take, n_real in self._index_batches(data, self.cfg.eval_batch_size,
                                                drop_last=False):
            sigs, labs, idx = self._step_inputs(data, take)
            loss, probs = self._run_eval_step(sigs, labs, idx)
            losses.append(np.asarray(loss)[:n_real])
            probs_all.append(np.asarray(probs)[:n_real])
            labels_all.append(data.labels[take[:n_real]])
        losses = np.concatenate(losses)
        probs_np = np.concatenate(probs_all)
        labels_np = np.concatenate(labels_all)
        out: Dict[str, Any] = {
            'loss': float(losses.mean()),
            **{k: float(v) for k, v in binary_stats(jnp.asarray(probs_np),
                                                    jnp.asarray(labels_np)).items()},
            **multilabel_auroc(probs_np, labels_np),
            'per_class_recall': per_class_recall(probs_np, labels_np),
            'classification_report': classification_report(probs_np, labels_np),
        }
        if loss_reduction == 'none':
            out['per_sample_loss'] = losses
        if return_predictions:
            out['predictions'] = {'probs': probs_np, 'labels': labels_np}
        return out

    def enable_int8_inference(self) -> Dict[str, float]:
        """Quantize the served weights (the EMA tree when tracked) to int8
        with per-output-channel scales; evaluate()/predict() then run the
        dequant-fused program (models/quantize.py).  Returns the size
        summary.  Call again after further training to re-snapshot."""
        from ..models.quantize import quantize_params_int8, quantized_bytes
        params = self._eval_params()
        assert params is not None, 'call init_state() or load a checkpoint first'
        rep = replicated(self.mesh)
        with self.mesh:
            qp, sc = quantize_params_int8(params)
            qp = jax.tree.map(lambda a: jax.device_put(a, rep), qp)
            sc = {k: jax.device_put(v, rep) for k, v in sc.items()}
        self._int8 = (qp, sc)
        before = quantized_bytes(params)
        after = quantized_bytes(qp) + quantized_bytes(list(sc.values()))
        summary = {'param_bytes_f32': before, 'param_bytes_int8': after,
                   'compression': before / max(after, 1)}
        self.logger.info(f'int8 inference enabled: {summary}')
        return summary

    def disable_int8_inference(self) -> None:
        self._int8 = None

    def _run_eval_step(self, sigs, labs, idx):
        """One jitted eval dispatch -- int8-quantized program when enabled."""
        with self.mesh:
            if self._int8 is not None:
                qp, sc = self._int8
                return self._eval_step_int8(qp, sc, sigs, labs, idx)
            return self._eval_step(self._eval_params(), sigs, labs, idx)

    def _eval_params(self):
        """Params used for evaluation/inference: the EMA weights when
        cfg.ema_decay > 0 (the smoothing exists to be served), else the raw
        trained params.  Early stopping therefore tracks EMA quality too."""
        if self.state is None:
            return None
        if self.cfg.ema_decay > 0 and self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params

    def predict(self, signals: np.ndarray) -> np.ndarray:
        """Batch inference: per-record sigmoid probabilities (N, num_class).

        The serving-side path: no labels required (``evaluate`` is the
        labeled counterpart).  Uses the same jitted eval program with dummy
        labels; partial final batches are padded and trimmed."""
        if self._eval_step is None:
            self._build_steps()
        assert self.state is not None, 'call init_state() or load a checkpoint first'
        data = SplitData(
            signals=np.asarray(signals, np.float32),
            labels=np.zeros((len(signals), self.model_cfg.num_class), np.float32))
        probs_all = []
        for take, n_real in self._index_batches(data, self.cfg.eval_batch_size,
                                                drop_last=False):
            # host-streaming on purpose: one-shot inference inputs should not
            # be pinned into the HBM-resident cache
            sigs = jnp.asarray(data.signals[take], jnp.float32)
            labs = jnp.asarray(data.labels[take], jnp.float32)
            idx = jnp.arange(take.size, dtype=jnp.int32)
            _, probs = self._run_eval_step(sigs, labs, idx)
            probs_all.append(np.asarray(probs)[:n_real])
        return np.concatenate(probs_all)

    def predict_long(self, signals: np.ndarray, window: Optional[int] = None,
                     hop: Optional[int] = None, agg: str = 'max'
                     ) -> np.ndarray:
        """Sliding-window inference on records LONGER than the model's input
        (INCART 30-min strips, MIMIC telemetry -- corpora the reference only
        stores, SURVEY.md §5 long-context): window the signal, predict each
        window as a batch, aggregate per-class probabilities across windows.

        ``window`` defaults to the model's input length (minus the always-pad
        patch); ``hop`` to window/2 (50% overlap).  ``agg``: 'max' (a finding
        anywhere in the record counts -- the multi-label clinical default) or
        'mean'.  Returns (N, num_class).
        """
        assert agg in ('max', 'mean'), agg
        signals = np.asarray(signals, np.float32)
        if signals.ndim == 2:
            signals = signals[None]
        n, c, length = signals.shape
        explicit_window = window is not None
        window = window or (self.model_cfg.max_signal_length
                            - self.model_cfg.patch_size)
        hop = hop or max(1, window // 2)
        # predict() is lossless for any L < max_signal_length: time_end_pad
        # (always-pad quirk, ops/pad.py) takes L to the next patch multiple,
        # which stays <= max only while L < max.  Only slide windows beyond
        # that -- or when the caller explicitly asked for a smaller window.
        direct = (length <= window if explicit_window
                  else length < self.model_cfg.max_signal_length)
        if direct:
            return self.predict(signals)
        starts = list(range(0, length - window + 1, hop))
        if starts[-1] + window < length:       # cover the tail remainder
            starts.append(length - window)
        windows = np.stack([signals[:, :, s:s + window] for s in starts],
                           axis=1)             # (N, W, C, window)
        flat = windows.reshape(n * len(starts), c, window)
        probs = self.predict(flat).reshape(n, len(starts), -1)
        return probs.max(axis=1) if agg == 'max' else probs.mean(axis=1)

    # ------------------------------------------------------------ checkpoints
    def save_checkpoint(self, tag: str = 'final'):
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
        # exposed so the CLI can hint at --ema-decay when a checkpoint's EMA
        # weights were dropped because this trainer does not track them
        self.last_restore_info = extra
        # restore materializes host arrays: re-place on the mesh so FSDP/TP
        # shardings survive a resume
        pspec = param_shardings(self.state.params, self.mesh, fsdp=self.cfg.fsdp)
        osh = opt_state_shardings(self.state.opt_state, pspec, self.mesh)
        with self.mesh:
            self.state = self.state.replace(
                params=jax.tree.map(jax.device_put, self.state.params, pspec),
                opt_state=jax.tree.map(jax.device_put, self.state.opt_state, osh),
                ema_params=(jax.tree.map(jax.device_put,
                                         self.state.ema_params, pspec)
                            if self.state.ema_params is not None else None))
        self.epoch = int(extra.get('epoch', 0))
        self._host_step = int(self.state.step)  # one sync at restore is fine
        self._refresh_int8()
        return self.state

    # ----------------------------------------------------------------- logging
    def _log(self, payload: Dict[str, Any]):
        pretty = pretty_log_dict(payload)
        if self.cfg.log_to_console:
            self.logger.info(str(pretty))
        if self.logger_fl:
            self.logger_fl.info(str(pretty))
        if self.tb:
            self.tb.log(payload, step=self._host_step)

    def _log_epoch(self, metrics: Dict[str, Any], prefix: str):
        payload = {f'{prefix}/{k}': v for k, v in metrics.items()
                   if k not in ('per_sample_loss', 'predictions', 'history',
                                'classification_report')}
        payload.update(epoch=self.epoch, step=self._host_step)
        self._log(payload)


def get_all_setup(model_size: str = 'small', train_args: Optional[Dict] = None,
                  train_data: Optional[SplitData] = None,
                  eval_data: Optional[SplitData] = None,
                  norm_stats: Optional[Dict] = None, **kwargs) -> Trainer:
    """Convenience assembly mirroring reference get_all_setup (train.py:439-468)."""
    model_cfg = VitConfig.from_defined(f'ecg-vit-{model_size}')
    cfg = TrainConfig(**(train_args or {}))
    return Trainer(model_cfg, cfg, train_data=train_data, eval_data=eval_data,
                   norm_stats=norm_stats, **kwargs)
