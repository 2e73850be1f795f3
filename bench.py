"""Benchmark: fused preprocessing throughput on one chip (the north-star
metric -- BASELINE.md: >=10,000 ECG records/sec/chip for resample + bandpass
+ z-norm + window on v5e).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing note: on the tunneled 'axon' TPU platform ``block_until_ready`` does
NOT synchronize (verified: it reports PFLOP-scale fiction).  The honest
barrier is a small host transfer, which costs ~35 ms after a one-time tunnel
setup; we difference two iteration counts to cancel the barrier cost.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _timed_iters(run, inputs, n_iters: int) -> float:
    """Wall time of n_iters chained executions, synced by a scalar fetch."""
    t0 = time.perf_counter()
    out = None
    for i in range(n_iters):
        out = run(inputs[i % len(inputs)])
    _ = float(out.reshape(-1)[0])  # the only honest sync on this platform
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp
    from ecg_representation_learning_tpu.ops import fused_train_path
    from ecg_representation_learning_tpu.registry import PTBXL_TRAIN_STATS
    from ecg_representation_learning_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    batch = 2048
    x_np = rng.standard_normal((batch, 12, 5000)).astype(np.float32)
    mean = jnp.asarray(PTBXL_TRAIN_STATS['original']['mean'], jnp.float32)
    std = jnp.asarray(PTBXL_TRAIN_STATS['original']['std'], jnp.float32)

    def run(a):
        return fused_train_path(a, mean, std, fqs=500, target_fqs=250, patch_size=64)

    inputs = [jnp.asarray(x_np + np.float32(i)) for i in range(2)]
    # compile + one-time tunnel-transfer setup + warmup
    _ = float(run(inputs[0]).reshape(-1)[0])
    _timed_iters(run, inputs, 2)

    n_lo, n_hi = 4, 24
    t_lo = min(_timed_iters(run, inputs, n_lo) for _ in range(3))
    t_hi = min(_timed_iters(run, inputs, n_hi) for _ in range(3))
    per_iter = max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)

    recs_per_sec = batch / per_iter
    baseline = 10_000.0  # BASELINE.md north-star target
    print(json.dumps({
        'metric': 'preprocess_records_per_sec_per_chip',
        'value': round(recs_per_sec, 1),
        'unit': 'records/s',
        'vs_baseline': round(recs_per_sec / baseline, 3),
    }))


if __name__ == '__main__':
    main()
