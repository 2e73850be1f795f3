"""Attribute the full-train-step residual (VERDICT r4 directive #7).

PERF.md's composite speed-of-light for (ViT-base, bs-64, one chip) is
~16.7 ms (fwd+bwd 11.97 + optimizer ~4.0 + input/metrics ~0.5); the shipped
step measures ~18.5 ms.  This rig rebuilds the PRODUCTION step program
(trainer.py train_step -- same model, optimizer, donation, rbg PRNG) with one
component removed per leg, so each delta is that component's true marginal
cost inside the fused program:

  full        the production program (tr._train_step), ~18.5 ms anchor
  no_metrics  drop binary_stats + sigmoid + probs output
  no_rng      fixed dropout/timeout keys (no per-step rbg split / rng carry)
  no_prep     pre-gathered pre-normalized f32 batch passed as the argument
              (removes jnp.take + astype + normalize/pad AND the 61 MB
              resident-split dispatch walk -- the platform walks every
              program input at ~260 GB/s per dispatch, PERF.md round-3b)
  bare        none of the above: fwd+bwd+optimizer only -- the program the
              composite SOL row describes

Also measures the HOST loop tax: tr.train() wall per step (multi-step
dispatch, logging, index build) over the device step time.

Timing discipline follows bench.py (median-of-5 differenced pairs; probes
SEQUENTIAL on the tunnel -- memory/axon-tpu-timing-traps).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _per_iter_stats  # noqa: E402

from ecg_representation_learning_tpu.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig  # noqa: E402
from ecg_representation_learning_tpu.train.loop import finish_update  # noqa: E402
from ecg_representation_learning_tpu.train.metrics import binary_stats  # noqa: E402
from ecg_representation_learning_tpu.train.trainer import (SplitData,  # noqa: E402
                                                           Trainer, TrainState,
                                                           _prep_batch)

SIZE = os.environ.get('PROBE_SIZE', 'base')   # 'debug' = CPU smoke
BSZ = 64 if SIZE == 'base' else 8
N = 512 if SIZE == 'base' else 64
model_cfg = VitConfig.from_defined(SIZE, dtype='bfloat16')
cfg = TrainConfig(train_batch_size=BSZ, do_eval=False)
rng_np = np.random.default_rng(0)
data = SplitData(
    signals=rng_np.standard_normal((N, 12, 2500)).astype(np.float32),
    labels=(rng_np.uniform(size=(N, 71)) > 0.9).astype(np.float32))
tr = Trainer(model_cfg, cfg, train_data=data, output_dir='/tmp/probe-step')
tr.init_state()
tr._build_steps()
sigs, labs, _ = tr._step_inputs(data, np.arange(BSZ))
idxs = [jnp.asarray(rng_np.integers(0, N, BSZ).astype(np.int32))
        for _ in range(2)]

model, optimizer = tr.model, tr.optimizer
mean, std, patch = tr.mean, tr.std, model_cfg.patch_size
FIXED = tuple(jax.random.split(jax.random.PRNGKey(123), 2))


def make_step(prep: bool, rng_split: bool, metrics: bool):
    """The production train_step body with components toggled off.  Mirrors
    trainer.py:261-285 (accum=1, dense, no EMA)."""

    def loss_grads(params, sig, lab, do_rng):
        def loss_fn(p):
            out = model.apply(p, sig, labels=lab, deterministic=False,
                              rngs={'dropout': do_rng})
            return out.loss, out.logits
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, logits, grads

    if prep:
        def step(state, signals, labels, idx, nf):
            if rng_split:
                rng, to_rng, do_rng = jax.random.split(state.rng, 3)
            else:
                rng, (to_rng, do_rng) = state.rng, FIXED
            sig = jnp.take(signals, idx, axis=0).astype(jnp.float32)
            lab = jnp.take(labels, idx, axis=0)
            sig = _prep_batch(sig, mean, std, patch,
                              train=cfg.augment_timeout, rng=to_rng)
            loss, logits, grads = loss_grads(state.params, sig, lab, do_rng)
            new_state, gn, nf = finish_update(optimizer, cfg, state, grads,
                                              rng, nf)
            out = {'loss': loss, 'grad_norm': gn,
                   'learning_rate': tr.schedule(state.step)}
            if metrics:
                probs = jax.nn.sigmoid(logits.astype(jnp.float32))
                out.update(binary_stats(probs, lab))
            return new_state, out, nf
        return jax.jit(step, donate_argnums=(0, 4))

    def step(state, sig, lab, nf):
        if rng_split:
            rng, _, do_rng = jax.random.split(state.rng, 3)
        else:
            rng, do_rng = state.rng, FIXED[1]
        loss, logits, grads = loss_grads(state.params, sig, lab, do_rng)
        new_state, gn, nf = finish_update(optimizer, cfg, state, grads,
                                          rng, nf)
        out = {'loss': loss, 'grad_norm': gn,
               'learning_rate': tr.schedule(state.step)}
        if metrics:
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
            out.update(binary_stats(probs, lab))
        return new_state, out, nf
    return jax.jit(step, donate_argnums=(0, 3))


def time_leg(name, step_fn, prepped: bool):
    st = {'s': tr.init_state(), 'nf': jnp.zeros((), jnp.int32)}
    if prepped:
        pre = []
        for i in range(2):
            sig = jnp.take(sigs, idxs[i], axis=0).astype(jnp.float32)
            lab = jnp.take(labs, idxs[i], axis=0)
            sig = _prep_batch(sig, mean, std, patch, train=False)
            pre.append((jax.block_until_ready(sig), lab))

        def run(x):
            with tr.mesh:
                st['s'], m, st['nf'] = step_fn(st['s'], x[0], x[1], st['nf'])
            return m['loss']
        inputs = pre
    else:
        def run(idx):
            with tr.mesh:
                st['s'], m, st['nf'] = step_fn(st['s'], sigs, labs, idx,
                                               st['nf'])
            return m['loss']
        inputs = idxs
    s = _per_iter_stats(run, inputs)
    print(f'{name:12s} {s["median"]*1e3:7.2f} ms   '
          f'[{s["min"]*1e3:.2f}, {s["max"]*1e3:.2f}] k={s["k"]}', flush=True)
    return s['median']


def run_production_anchor():
    st = {'s': tr.init_state(), 'nf': jnp.zeros((), jnp.int32)}

    def run(idx):
        with tr.mesh:
            st['s'], m, _, st['nf'] = tr._train_step(st['s'], sigs, labs,
                                                     idx, st['nf'])
        return m['loss']
    s = _per_iter_stats(run, idxs)
    print(f'{"full":12s} {s["median"]*1e3:7.2f} ms   '
          f'[{s["min"]*1e3:.2f}, {s["max"]*1e3:.2f}] k={s["k"]}', flush=True)
    return s['median']


def make_fwdbwd_norm():
    """fwd+bwd ONLY, with global_norm forcing EVERY grad leaf live (no
    optimizer).  The round-3 'fwd+bwd 11.97 ms' probe returned a single grad
    leaf -- if XLA dead-coded part of the backward there, this leg exposes
    it: the true full-backward cost is what composition actually pays."""
    def step(params, sig, lab, do_rng):
        def loss_fn(p):
            out = model.apply(p, sig, labels=lab, deterministic=False,
                              rngs={'dropout': do_rng})
            return out.loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        import optax
        return loss, optax.global_norm(grads)
    return jax.jit(step)


def time_fwdbwd_norm():
    st = tr.init_state()
    pre = []
    for i in range(2):
        sig = jnp.take(sigs, idxs[i], axis=0).astype(jnp.float32)
        lab = jnp.take(labs, idxs[i], axis=0)
        sig = _prep_batch(sig, mean, std, patch, train=False)
        pre.append((jax.block_until_ready(sig), lab))
    fn = make_fwdbwd_norm()

    def run(x):
        with tr.mesh:
            loss, gn = fn(st.params, x[0], x[1], FIXED[1])
        return gn
    s = _per_iter_stats(run, pre)
    print(f'{"fwdbwd_norm":12s} {s["median"]*1e3:7.2f} ms   '
          f'[{s["min"]*1e3:.2f}, {s["max"]*1e3:.2f}] k={s["k"]}', flush=True)
    return s['median']


full = run_production_anchor()
no_metrics = time_leg('no_metrics', make_step(True, True, False), False)
no_rng = time_leg('no_rng', make_step(True, False, True), False)
no_prep = time_leg('no_prep', make_step(False, True, True), True)
bare = time_leg('bare', make_step(False, False, False), True)
fwdbwd = time_fwdbwd_norm()
print(f'  fwd+bwd with ALL grads live (no optimizer): {fwdbwd*1e3:.2f} ms '
      f'(round-3 single-leaf probe said 11.97)')

print(f'\nattribution (marginal cost inside the fused program):')
print(f'  metrics (binary_stats+sigmoid+probs): {(full-no_metrics)*1e3:+.2f} ms')
print(f'  rng split/carry (rbg):                {(full-no_rng)*1e3:+.2f} ms')
print(f'  gather+prep+input walk:               {(full-no_prep)*1e3:+.2f} ms')
print(f'  bare fwd+bwd+optimizer:               {bare*1e3:.2f} ms '
      f'(composite-SOL row: ~16.2)')
print(f'  unexplained vs sum of parts:          '
      f'{(full - bare - (full-no_metrics) - (full-no_rng) - (full-no_prep))*1e3:+.2f} ms')

# host loop tax: production epoch loop wall per step over the device step
import dataclasses  # noqa: E402

tr.cfg = dataclasses.replace(cfg, num_train_epoch=1, log_per_epoch=True,
                             log_to_console=False, save_final=False)
tr.init_state()  # the timing legs donated the previous state's buffers
tr.train()  # warm: compile multi_step + first-touch logging
tr.epoch = 0    # train() runs (num_train_epoch - epoch) epochs; rewind so
tr.init_state()  # the timed call below actually trains
t0 = time.time()
tr.train()
steps = tr.steps_per_epoch
wall = (time.time() - t0) / steps
print(f'\nhost loop: {wall*1e3:.2f} ms/step wall over {full*1e3:.2f} ms device '
      f'(tax {(wall-full)*1e3:+.2f} ms/step at steps_per_dispatch='
      f'{cfg.steps_per_dispatch})')
