"""Optimizer + LR schedule factory, with a single-pass fused Adam/AdamW.

Reference semantics (models/train.py:242-252, 407-427): AdamW (or Adam) at
lr 3e-4, weight decay 1e-2, HF constant/cosine schedule with warmup
(warmup_ratio 5% of total steps), global-norm gradient clipping at 1.0
(train.py:281).  The HF cosine schedule decays to 0 over ``n_step``;
optax's warmup_cosine_decay matches it exactly.

Why the fused path exists (PERF.md round-3 bisect): the optax
``chain(clip_by_global_norm, adamw)`` + ``apply_updates`` pipeline
materializes a full parameter-sized tree at every stage boundary (clip
scale, mu, nu, adam updates, decayed updates, lr-scaled updates, final
add), ~5.8 GB of HBM traffic per ViT-base step = 6.9 ms measured of a
19.8 ms step.  :class:`FusedAdamW` computes the identical math in ONE
multi-output elementwise pass per leaf (reads g/mu/nu/p, writes mu/nu/p,
~2.4 GB -- the HBM floor for Adam), with global-norm clipping and
non-finite-gradient zeroing folded into a single scalar multiplier on the
gradient read.  Numerical parity with the optax chain:
tests/test_fused_optim.py.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import optax

from ..configs import TrainConfig
from ..utils.check_args import ca


class FusedAdamWState(NamedTuple):
    """Mirrors optax's ScaleByAdamState (count, mu, nu); the mu/nu subtrees
    mirror the param tree, so parallel/mesh.py:opt_state_shardings shards
    them exactly like Adam moments from an optax chain (FSDP/ZeRO)."""
    count: jnp.ndarray
    mu: Any
    nu: Any


class FusedAdamW:
    """Adam/AdamW + global-norm clip + non-finite zeroing in one fused pass.

    ``apply(grads, state, params) -> (new_params, new_state)`` replaces the
    optax ``update`` + ``apply_updates`` pair; :func:`apply_optimizer`
    dispatches on the type so trainers stay optimizer-agnostic.

    Exact optax semantics: bias correction uses the post-increment count,
    the schedule is evaluated at the pre-increment count, weight decay is
    added to the adam term before lr scaling (optax.adamw), clipping scales
    by min(1, clip/||g||), and zeroed (non-finite) steps still decay the
    moments -- matching the trainer's zero-grads-then-update sanitizer.
    """

    def __init__(self, learning_rate: Union[float, Callable], *,
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                 weight_decay: float = 0.0,
                 clip_norm: Optional[float] = None,
                 zero_nonfinite: bool = False, mu_dtype=None,
                 use_pallas: Optional[bool] = None):
        self.learning_rate = learning_rate
        self.b1, self.b2, self.eps = b1, b2, eps
        self.weight_decay = weight_decay
        self.clip_norm = clip_norm
        self.zero_nonfinite = zero_nonfinite
        self.mu_dtype = jnp.dtype(mu_dtype) if mu_dtype is not None else None
        # Pallas streaming-update kernel (ops/adamw_pallas.py); measured at
        # parity with this XLA lowering (both at the HBM floor), so off by
        # default -- see the kernel module docstring
        self.use_pallas = use_pallas

    def init(self, params) -> FusedAdamWState:
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=self.mu_dtype or p.dtype), params)
        nu = jax.tree.map(jnp.zeros_like, params)
        return FusedAdamWState(count=jnp.zeros((), jnp.int32), mu=mu, nu=nu)

    def apply(self, grads, state: FusedAdamWState, params):
        b1, b2, eps, wd = self.b1, self.b2, self.eps, self.weight_decay
        scale = jnp.asarray(1.0, jnp.float32)
        finite = None
        if self.clip_norm is not None or self.zero_nonfinite:
            g_norm = optax.global_norm(grads)  # CSE-dedupes with the
            # trainer's metrics grad_norm (identical subexpression)
            if self.clip_norm is not None:
                scale = jnp.minimum(
                    1.0, self.clip_norm / jnp.maximum(g_norm, 1e-16))
            if self.zero_nonfinite:
                # select, NOT multiply: NaN * 0 stays NaN
                finite = jnp.isfinite(g_norm)
                scale = jnp.where(finite, scale, 1.0)
        count = optax.safe_increment(state.count)
        lr = (self.learning_rate(state.count)
              if callable(self.learning_rate) else self.learning_rate)
        lr = jnp.asarray(lr, jnp.float32)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf(g, mu, nu, p):
            g32 = g.astype(jnp.float32) * scale
            if finite is not None:
                g32 = jnp.where(finite, g32, 0.0)
            mu2 = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g32
            nu2 = b2 * nu + (1.0 - b2) * jnp.square(g32)
            upd = (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps)
            if wd:
                upd = upd + wd * p
            p2 = p - lr * upd
            return (mu2.astype(mu.dtype), nu2, p2.astype(p.dtype))

        # Default False: the Pallas streaming kernel measures the same 4.1 ms
        # as this XLA lowering on ViT-base (both at the practical HBM floor;
        # cost_analysis 1.3 GB aliased vs 4.42 GB counted) and composes
        # slightly worse inside the full step (19.09 vs 18.48 ms) -- kept as
        # the floor-proof and for layouts XLA fuses badly (PERF.md round 3).
        use_pallas = bool(self.use_pallas)
        if use_pallas:
            from ..ops.adamw_pallas import adamw_update_leaf, leaf_eligible
            finite_flag = (finite.astype(jnp.float32) if finite is not None
                           else jnp.asarray(1.0, jnp.float32))
            scalars = jnp.stack([scale, lr, bc1, bc2, finite_flag]
                                ).reshape(1, 5).astype(jnp.float32)

            def leaf_dispatch(g, mu, nu, p):
                if leaf_eligible(g, mu, nu, p):
                    return adamw_update_leaf(g, mu, nu, p, scalars,
                                             b1=b1, b2=b2, eps=eps, wd=wd)
                return leaf(g, mu, nu, p)
        else:
            leaf_dispatch = leaf

        flat_g, treedef = jax.tree.flatten(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        flat_p = treedef.flatten_up_to(params)
        out = [leaf_dispatch(g, m, n, p)
               for g, m, n, p in zip(flat_g, flat_mu, flat_nu, flat_p)]
        mu = treedef.unflatten([o[0] for o in out])
        nu = treedef.unflatten([o[1] for o in out])
        new_params = treedef.unflatten([o[2] for o in out])
        return new_params, FusedAdamWState(count=count, mu=mu, nu=nu)


def adam_moments(opt_state):
    """(mu, nu) for either optimizer-state layout: FusedAdamWState or the
    optax chain ``(clip, (scale_by_adam, wd, lr))`` -- introspection used by
    sharding checks and the multichip dryrun."""
    if hasattr(opt_state, 'mu'):
        return opt_state.mu, opt_state.nu
    adam = opt_state[1][0]
    return adam.mu, adam.nu


def apply_optimizer(optimizer, grads, opt_state, params):
    """One optimizer step -> (new_params, new_opt_state).  Dispatches to the
    fused single-pass path for :class:`FusedAdamW`, else the standard optax
    update + apply_updates pair.  NOTE: for FusedAdamW, clipping and
    non-finite zeroing happen INSIDE apply -- callers must not pre-zero or
    pre-clip the gradients on that path."""
    if isinstance(optimizer, FusedAdamW):
        return optimizer.apply(grads, opt_state, params)
    updates, new_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_state


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
                   ) -> Tuple[Any, optax.Schedule]:
    """Build the optimizer + schedule.  Adam/AdamW get the fused single-pass
    implementation by default (``cfg.fused_optimizer``); the optax chain
    remains as the reference implementation and the escape hatch."""
    ca(optimizer=cfg.optimizer)
    sched = make_schedule(cfg, total_steps)
    mu_dtype = cfg.adam_mu_dtype  # e.g. 'bfloat16': halves m-moment HBM traffic
    if cfg.fused_optimizer:
        return FusedAdamW(
            sched,
            weight_decay=cfg.weight_decay if cfg.optimizer == 'AdamW' else 0.0,
            clip_norm=cfg.grad_clip_norm,
            zero_nonfinite=cfg.debug_nans,
            mu_dtype=mu_dtype), sched
    if cfg.optimizer == 'AdamW':
        opt = optax.adamw(sched, weight_decay=cfg.weight_decay, mu_dtype=mu_dtype)
    else:
        opt = optax.adam(sched, mu_dtype=mu_dtype)
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), opt), sched
