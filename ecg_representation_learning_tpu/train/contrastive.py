"""Contrastive (NT-Xent) pretraining loop + encoder transfer.

Second self-supervised family next to MAE (train/pretrain.py): two
morphology-safe stochastic views per record are built ON DEVICE inside the
jitted step (ops/augment.py contrastive_view), both views run through the
shared ``EcgVitEncoder`` trunk in ONE forward (concatenated batch -- bigger
GEMMs for the MXU), and the InfoNCE loss contrasts each anchor against the
full GLOBAL batch: with the batch sharded over the data axis, GSPMD
all-gathers the (2B, proj_dim) projection matrix over ICI, so cross-chip
negatives come from one small collective rather than a torch-style
gather-with-grad.

Loop mechanics (epoch loop, HBM-resident splits, checkpoints/resume, numeric
sanitizer, triple logging, streaming mode) are inherited from ``MaeTrainer``
unchanged -- only the model, the jitted step, and the eval protocol differ.
The reference has no pretraining loop at all (SURVEY.md §7 stage 7); its
headline-metric paper (*Self-supervised representation learning from 12-lead
ECG data*, reference util/train.py:34-40) pretrains contrastively.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..configs import ContrastiveConfig, MaeConfig, TrainConfig, VitConfig
from ..models.contrastive import EcgContrastive, nt_xent
from ..ops.augment import contrastive_view
from ..parallel.mesh import (DATA_AXIS, batch_sharding, opt_state_shardings,
                             param_shardings, replicated)
from ..utils.logging import get_logger
from .loop import finish_update, grad_accum_scan
from .pretrain import MaeTrainer
from .trainer import SplitData, TrainState, _prep_batch


class ContrastiveTrainer(MaeTrainer):
    """SimCLR-style pretrainer over the shared ViT trunk."""

    def __init__(
        self,
        model_cfg: VitConfig,
        con_cfg: ContrastiveConfig,
        train_cfg: TrainConfig,
        train_data: Optional[SplitData] = None,
        eval_data: Optional[SplitData] = None,
        norm_stats: Optional[Dict[str, Any]] = None,
        output_dir: Optional[str] = None,
        mesh=None,
    ):
        import os
        super().__init__(model_cfg, MaeConfig(), train_cfg,
                         train_data=train_data, eval_data=eval_data,
                         norm_stats=norm_stats,
                         output_dir=output_dir or os.path.join('runs', 'contrastive'),
                         mesh=mesh)
        self.con_cfg = con_cfg
        self.model = EcgContrastive(model_cfg, con_cfg)
        self.logger = get_logger('EcgContrastive Pretrain')
        if max(1, train_cfg.grad_accum) > 1:
            # NT-Xent is a whole-batch objective: under accumulation each
            # microbatch contrasts only against ITSELF, so the negatives pool
            # shrinks to batch/accum -- a silent objective change if unnoticed
            # (ARCHITECTURE.md trainer-feature matrix)
            self.logger.warning(
                'grad_accum=%d on ContrastiveTrainer: NT-Xent negatives are '
                'MICROBATCH-local (%d samples, not %d) -- the objective '
                'weakens with accum. Prefer a mesh/data-parallel batch '
                '(negatives are all-gathered globally) over accumulation.',
                train_cfg.grad_accum,
                train_cfg.train_batch_size // max(1, train_cfg.grad_accum),
                train_cfg.train_batch_size)

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        rng, init_rng = jax.random.split(rng)
        dummy = jnp.zeros((2, self.model_cfg.num_channels,
                           self.model_cfg.max_signal_length), jnp.float32)
        variables = self.model.init(init_rng, dummy)
        params = ({'params': variables['params']}
                  if set(variables) != {'params'} else variables)
        opt_state = self.optimizer.init(params)
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

    # ------------------------------------------------------------- jitted step
    def _views(self, sig, rng):
        """Two stochastic views of a raw (B, C, L) batch -> normalized,
        padded, cropped model inputs, still batch-sharded."""
        cc = self.con_cfg
        mean, std, patch = self.mean, self.std, self.model_cfg.patch_size
        k_a, k_b = jax.random.split(rng)
        views = []
        for k in (k_a, k_b):
            v = contrastive_view(
                k, sig, scale_lo=cc.scale_lo, scale_hi=cc.scale_hi,
                jitter_sigma=cc.jitter_sigma, lead_dropout=cc.lead_dropout,
                shift_frac=cc.shift_frac, timeout_hi=cc.timeout_hi)
            v = _prep_batch(v, mean, std, patch, train=False)
            views.append(v[..., :self.model_cfg.max_signal_length])
        # [views_a; views_b]: row i pairs with row i+B (models/contrastive.py)
        x = jnp.concatenate(views, axis=0)
        return jax.lax.with_sharding_constraint(x, P(DATA_AXIS))

    def _build_step(self):
        model, cfg, cc = self.model, self.cfg, self.con_cfg
        tp_ctx = self._tp_ctx()
        accum = max(1, cfg.grad_accum)

        def micro_grads(params, signals, idx_k, aug_rng, do_rng):
            """One (micro)batch: gather -> two views -> NT-Xent + grads.

            Under grad accumulation (accum > 1) the negatives pool is the
            MICROBATCH: NT-Xent is a whole-batch objective, so accumulation
            trades negatives-per-anchor for activation memory (each update
            then averages ``accum`` independent (B/accum)-sized NT-Xent
            losses).  Callers who need the full negatives pool should prefer
            FSDP/remat over accumulation here (ARCHITECTURE.md matrix)."""
            sig = jnp.take(signals, idx_k, axis=0).astype(jnp.float32)
            sig = jax.lax.with_sharding_constraint(sig, P(DATA_AXIS))
            x = self._views(sig, aug_rng)

            def loss_fn(params):
                from ..models.moe import apply_with_moe
                with tp_ctx():
                    z, aux = apply_with_moe(
                        model, params, x, deterministic=False,
                        rngs={'dropout': do_rng},
                        moe=self.model_cfg.moe_num_experts > 0)
                loss, acc = nt_xent(z, cc.temperature, with_accuracy=True)
                return loss + self.model_cfg.moe_aux_weight * aux, (loss, acc)

            (_, aux_out), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return aux_out, grads

        def train_step(state: TrainState, signals, idx, nonfinite_count):
            rng, aug_rng, do_rng = jax.random.split(state.rng, 3)
            # shared loop mechanics (train/loop.py): accumulation scan +
            # sanitizer + optimizer + EMA -- one implementation everywhere
            (loss, acc), grads = grad_accum_scan(
                lambda p, idx_k, r: micro_grads(p, signals, idx_k, r[0], r[1]),
                state.params, idx, (aug_rng, do_rng), accum)
            if accum > 1:
                loss, acc = loss.mean(), acc.mean()
            new_state, grad_norm, nonfinite_count = finish_update(
                self.optimizer, cfg, state, grads, rng, nonfinite_count)
            return new_state, {'loss': loss, 'contrast_acc': acc,
                               'grad_norm': grad_norm,
                               'learning_rate': self.schedule(state.step)}, \
                nonfinite_count

        def eval_step(params, signals, idx, aug_rng):
            sig = jnp.take(signals, idx, axis=0).astype(jnp.float32)
            sig = jax.lax.with_sharding_constraint(sig, P(DATA_AXIS))
            x = self._views(sig, aug_rng)
            with tp_ctx():
                z = model.apply(params, x, deterministic=True)
            return nt_xent(z, cc.temperature, with_accuracy=True)

        with self.mesh:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 3))
            self._eval_step = jax.jit(eval_step)

    def evaluate(self, data: Optional[SplitData] = None, seed: int = 0) -> float:
        """Held-out NT-Xent loss with FIXED view rngs and FULL batches only.

        Unlike the MAE evaluator (per-sample losses; ragged tail padded), the
        contrastive loss is a property of the whole batch -- padding the tail
        with duplicated rows would inject identical false negatives -- so the
        ragged remainder is dropped.  Fixed rng + fixed batching make the
        number comparable across epochs/runs.
        """
        data = data if data is not None else self.eval_data
        assert data is not None and len(data) > 0, 'no eval data'
        if self._eval_step is None:
            self._build_step()
        if self.state is None:
            self.init_state()
        # a split smaller than eval_batch_size evaluates as one smaller full
        # batch (the loss is batch-defined, so shrinking beats zero-padding
        # with duplicate rows); one extra jit specialization at most
        bsz = min(self.cfg.eval_batch_size, len(data))
        assert bsz >= 4, (
            f'contrastive eval needs a batch of >=4 for a meaningful '
            f'negative pool (got batch {bsz} = min(eval_batch_size='
            f'{self.cfg.eval_batch_size}, split rows {len(data)}))')
        rng = jax.random.PRNGKey(seed)
        losses = []
        for i in range(0, len(data) - bsz + 1, bsz):
            take = np.arange(i, i + bsz)
            rng, aug_rng = jax.random.split(rng)
            sigs, take_dev = self._sig_inputs(data, take)
            with self.mesh:
                loss, _ = self._eval_step(self._eval_params(), sigs,
                                          take_dev, aug_rng)
            losses.append(float(loss))
        return float(np.mean(losses))

    def build_stream_step(self, raw_fqs: Optional[int] = None,
                          wire_scale: Optional[float] = None):
        """Streaming contrastive pretrain step: raw (B, C, L) host batches ->
        two on-device views -> fused resample+lowpass+normalize per view (when
        ``raw_fqs`` is set) -> NT-Xent -> optimizer, state donated.  Same
        contract as the MAE version (train_stream drives either)."""
        from ..ops.preprocess import fused_train_path
        mean, std, patch = self.mean, self.std, self.model_cfg.patch_size
        cc = self.con_cfg
        bsharding = batch_sharding(self.mesh)
        tp_ctx = self._tp_ctx()

        def stream_step(state: TrainState, sig):
            rng, aug_rng, do_rng = jax.random.split(state.rng, 3)
            sig = jax.lax.with_sharding_constraint(sig, P(DATA_AXIS))
            if wire_scale is not None:
                sig = sig.astype(jnp.float32) / jnp.float32(wire_scale)
            k_a, k_b = jax.random.split(aug_rng)
            views = []
            for k in (k_a, k_b):
                v = contrastive_view(
                    k, sig.astype(jnp.float32), scale_lo=cc.scale_lo,
                    scale_hi=cc.scale_hi, jitter_sigma=cc.jitter_sigma,
                    lead_dropout=cc.lead_dropout, shift_frac=cc.shift_frac,
                    timeout_hi=cc.timeout_hi)
                if raw_fqs is not None and raw_fqs != 250:
                    v = fused_train_path(v, mean, std, fqs=raw_fqs,
                                         target_fqs=250, patch_size=patch)
                else:
                    v = _prep_batch(v, mean, std, patch, train=False)
                views.append(v[..., :self.model_cfg.max_signal_length])
            x = jax.lax.with_sharding_constraint(
                jnp.concatenate(views, axis=0), P(DATA_AXIS))

            def loss_fn(params):
                from ..models.moe import apply_with_moe
                with tp_ctx():
                    z, aux = apply_with_moe(
                        self.model, params, x, deterministic=False,
                        rngs={'dropout': do_rng},
                        moe=self.model_cfg.moe_num_experts > 0)
                loss = nt_xent(z, cc.temperature)
                return loss + self.model_cfg.moe_aux_weight * aux, loss

            (_, loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            # shared update tail (optimizer + EMA), same as the MAE stream
            new_state, _, _ = finish_update(self.optimizer, self.cfg, state,
                                            grads, rng, jnp.zeros((), jnp.int32))
            return new_state, loss

        with self.mesh:
            return jax.jit(stream_step, donate_argnums=(0,),
                           in_shardings=(None, bsharding))


# ---------------------------------------------------------------------------
# Encoder transfer
# ---------------------------------------------------------------------------
def transfer_contrastive_encoder(con_params, vit_params):
    """Copy the contrastive trunk into an ``EcgVit`` param tree.

    Both models build the trunk as ``EcgVitEncoder(name='encoder')``
    (models/contrastive.py / models/vit.py), so the transfer is a verbatim
    subtree copy -- no name mapping.  Head stays at its fresh init; the
    projection MLP is discarded (standard SimCLR transfer protocol).  The
    trunk shapes are validated against the target, so a wrong-size checkpoint
    fails loudly instead of at first jit.
    """
    import flax
    con_p = flax.core.unfreeze(con_params)['params']
    vit_p = flax.core.unfreeze(vit_params)
    from .checkpoint import _shape_summary, _tree_shapes
    saved, expected = (_tree_shapes(con_p['encoder']),
                       _tree_shapes(vit_p['params']['encoder']))
    if saved != expected:
        raise ValueError(
            f'contrastive encoder does not match this model: saved '
            f'{_shape_summary(con_p["encoder"])} vs expected '
            f'{_shape_summary(vit_p["params"]["encoder"])} -- wrong model size?')
    vit_p['params']['encoder'] = jax.tree.map(jnp.asarray, con_p['encoder'])
    return (flax.core.freeze(vit_p)
            if isinstance(vit_params, flax.core.FrozenDict) else vit_p)


def _raw_pretrain_params(path: str):
    """Template-free restore of a pretrain checkpoint's param tree.  Only the
    encoder subtree is consumed downstream, so differing projection/decoder
    configs (or optimizer chains) in the checkpoint don't need a template."""
    import os

    import orbax.checkpoint as ocp
    from .checkpoint import wait_for_checkpoints
    wait_for_checkpoints()
    raw = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    # checkpoints trained with ema_decay carry the EMA tree as a sibling
    # (checkpoint._to_pytree); the smoothing exists to be transferred, so
    # prefer it for the SSL -> supervised handoff
    ema = raw.get('ema_params')
    return ema if ema is not None else raw['params']


def detect_encoder_kind(path: str) -> str:
    """'mae' | 'contrastive' from a checkpoint's raw param-tree structure
    (no template needed): the MAE tree is flat (``encoder_patch_embed``,
    ``encoder_block_i``, ...), the contrastive tree nests the shared trunk
    under ``encoder`` next to the projection head."""
    return _detect_kind(set(_raw_pretrain_params(path)['params']), path)


def _detect_kind(names, path: str) -> str:
    if 'encoder' in names and 'proj_fc1' in names:
        return 'contrastive'
    if any(n.startswith('encoder_') for n in names):
        return 'mae'
    raise ValueError(
        f'checkpoint {path} is neither an MAE nor a contrastive pretrain '
        f'checkpoint (param groups: {sorted(names)[:6]}...)')


def load_contrastive_encoder(path: str):
    """Restore a contrastive checkpoint (``cli pretrain --objective
    contrastive`` output) and return its param tree for
    :func:`transfer_contrastive_encoder`."""
    return _raw_pretrain_params(path)


def load_any_encoder(path: str, vit_params):
    """Auto-detecting SSL -> supervised handoff: restore the pretrain
    checkpoint at ``path`` (MAE or contrastive) and return ``vit_params``
    with the trunk transferred in."""
    saved = _raw_pretrain_params(path)
    kind = _detect_kind(set(saved['params']), path)
    if kind == 'contrastive':
        return transfer_contrastive_encoder(saved, vit_params)
    from .pretrain import transfer_encoder
    return transfer_encoder(saved, vit_params)
