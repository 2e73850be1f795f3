"""MAE batch-curve anomaly probe (VERDICT r3 weak #3 / r4 directive #5).

When ``bench.py``'s ``mae_stream_samples_per_sec`` leg flags a non-monotone
interior point on the bs->throughput curve (the round-3 bs-128 cliff), run
this SAME round to pin the cause before the program composition changes:

    python tools/mae_curve_probe.py --bs 96 128   # the dip and a neighbor

For each batch size it (1) re-times the exact bench stream step and (2) dumps
the full optimized HLO to ``/tmp/mae_hlo_bs{N}/`` via XLA_FLAGS, so the two
adjacent shapes' fusion decisions can be diffed (look for a dot/fusion op
whose tiling differs only at the anomalous shape).

Must run from /root/repo (the axon TPU backend registers on cwd).
"""
import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bs', type=int, nargs='+', default=[96, 128],
                    help='batch sizes to time + HLO-dump (pick the dip and '
                         'its neighbors)')
    ap.add_argument('--no-dump', action='store_true',
                    help='timing only (HLO dumps are large)')
    args = ap.parse_args()

    if not args.no_dump:
        # must be set before jax initializes the backend
        dump_root = '/tmp/mae_hlo'
        flags = os.environ.get('XLA_FLAGS', '')
        os.environ['XLA_FLAGS'] = (
            f'{flags} --xla_dump_to={dump_root} '
            f'--xla_dump_hlo_as_text --xla_dump_hlo_pass_re=.*fusion.*'
        ).strip()
        print(f'HLO dumps -> {dump_root}/ (module names carry shapes)')

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np
    import jax.numpy as jnp

    import bench
    from ecg_representation_learning_tpu.configs import (MaeConfig, TrainConfig,
                                                         VitConfig)
    from ecg_representation_learning_tpu.registry import PTBXL_TRAIN_STATS
    from ecg_representation_learning_tpu.runtime import enable_compilation_cache
    from ecg_representation_learning_tpu.train.pretrain import MaeTrainer
    if args.no_dump:
        enable_compilation_cache()  # dumps need a real compile, not a cache hit

    model_cfg = VitConfig.from_defined('base', dtype='bfloat16')
    rng = np.random.default_rng(0)
    for bsz in args.bs:
        tr = MaeTrainer(model_cfg, MaeConfig(),
                        TrainConfig(train_batch_size=bsz),
                        norm_stats={'mean': PTBXL_TRAIN_STATS['original']['mean'],
                                    'std': PTBXL_TRAIN_STATS['original']['std']},
                        output_dir='/tmp/mae-curve-probe')
        tr.init_state()
        step_fn = tr.build_stream_step(raw_fqs=500)
        x = rng.standard_normal((bsz, 12, 5000)).astype(np.float32)
        batches = [jnp.asarray(x + np.float32(i)) for i in range(2)]
        state = {'s': tr.state}

        def run(sig):
            with tr.mesh:
                state['s'], loss = step_fn(state['s'], sig)
            return loss

        stats = bench._per_iter_stats(run, batches, repeats=3)
        print(f'bs={bsz}: {stats["median"]*1e3:.2f} ms/step '
              f'[{stats["min"]*1e3:.2f}, {stats["max"]*1e3:.2f}] '
              f'= {bsz/stats["median"]:.0f} samples/s')
        del tr, state, batches


if __name__ == '__main__':
    main()
