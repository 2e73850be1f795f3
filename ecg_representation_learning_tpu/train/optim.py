"""Optimizer + LR schedule factory (optax).

Reference semantics (models/train.py:242-252, 407-427): AdamW (or Adam) at
lr 3e-4, weight decay 1e-2, HF constant/cosine schedule with warmup
(warmup_ratio 5% of total steps), global-norm gradient clipping at 1.0
(train.py:281).  The HF cosine schedule decays to 0 over ``n_step``;
optax's warmup_cosine_decay matches it exactly.
"""
from __future__ import annotations

from typing import Tuple

import optax

from ..configs import TrainConfig
from ..utils.check_args import ca


def make_schedule(cfg: TrainConfig, total_steps: int) -> optax.Schedule:
    ca(schedule=cfg.schedule)
    warmup = int(round(total_steps * cfg.warmup_ratio))
    if cfg.schedule == 'constant':
        if warmup <= 0:
            return optax.constant_schedule(cfg.learning_rate)
        return optax.join_schedules([
            optax.linear_schedule(0.0, cfg.learning_rate, warmup),
            optax.constant_schedule(cfg.learning_rate),
        ], [warmup])
    if cfg.schedule == 'cosine':
        if warmup <= 0:
            return optax.cosine_decay_schedule(cfg.learning_rate,
                                               max(total_steps, 1))
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=warmup, decay_steps=max(total_steps, 2),
            end_value=0.0)
    raise ValueError(f'Unknown schedule {cfg.schedule!r}')


def make_optimizer(cfg: TrainConfig, total_steps: int
                   ) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    ca(optimizer=cfg.optimizer)
    sched = make_schedule(cfg, total_steps)
    mu_dtype = cfg.adam_mu_dtype  # e.g. 'bfloat16': halves m-moment HBM traffic
    if cfg.optimizer == 'AdamW':
        opt = optax.adamw(sched, weight_decay=cfg.weight_decay, mu_dtype=mu_dtype)
    else:
        opt = optax.adam(sched, mu_dtype=mu_dtype)
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), opt), sched
