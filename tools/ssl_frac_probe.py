"""SSL-transfer regime finder: label fraction vs delta, shared trunk.

Round-5 grid finding (tools/ssl_grid.py): at 2% labels (348 records) the
scratch model learns features directly (0.733) and BEATS the frozen-trunk
probe (0.58-0.63), so the MAE init is worth only ~+0.006 +/- noise; gentle
second-stage lrs (1e-4, LP-FT@1e-4) underfit at this tiny step budget.  SSL
pays off where labels are too few to learn features from scratch -- this rig
maps that regime: one (longer) pretrain, then scratch-vs-ssl fine-tunes at
several label fractions x subset seeds.

Usage: python tools/ssl_frac_probe.py [FRACS] [SEEDS] [PT_EP]
       e.g. python tools/ssl_frac_probe.py 0.005,0.01 13,7,21 80
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecg_representation_learning_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ecg_representation_learning_tpu.configs import (MaeConfig,  # noqa: E402
                                                     TrainConfig, VitConfig)
from ecg_representation_learning_tpu.data import (get_ptbxl_splits,  # noqa: E402
                                                  synth_ptbxl_device)
from ecg_representation_learning_tpu.train import Trainer  # noqa: E402
from ecg_representation_learning_tpu.train.metrics import roc_auc  # noqa: E402
from ecg_representation_learning_tpu.train.pretrain import (MaeTrainer,  # noqa: E402
                                                            transfer_encoder)
from ecg_representation_learning_tpu.train.trainer import SplitData  # noqa: E402

K = 16
FRACS = [float(f) for f in (sys.argv[1].split(',') if len(sys.argv) > 1
                            else ['0.005', '0.01'])]
SEEDS = [int(s) for s in (sys.argv[2].split(',') if len(sys.argv) > 2
                          else ['13', '7', '21'])]
PT_EP = int(sys.argv[3]) if len(sys.argv) > 3 else 80

signals, labels, folds = synth_ptbxl_device(n=21837, length=2500,
                                            n_marker_classes=K)
splits = get_ptbxl_splits(signals, labels, folds)
del signals
n_tr = len(splits.train)
model_cfg = VitConfig.from_defined('base', dtype='bfloat16')


def macro(tr):
    ev = tr.evaluate(splits.test, return_predictions=True)
    probs, labs = ev['predictions']['probs'], ev['predictions']['labels']
    aucs = [roc_auc(probs[:, j], labs[:, j]) for j in range(K)]
    return float(np.mean([a for a in aucs if not np.isnan(a)]))


def snap(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


mt = MaeTrainer(model_cfg, MaeConfig(mask_ratio=0.75),
                TrainConfig(num_train_epoch=PT_EP, train_batch_size=256,
                            learning_rate=1e-3, do_eval=False,
                            save_final=False, log_per_epoch=True,
                            log_to_console=False, resident_dtype='float16'),
                train_data=splits.train, output_dir='/tmp/sslfrac-mae')
res = mt.train()
print(f'pretrain {PT_EP}ep loss {res["loss"]:.4f}', flush=True)
enc = snap(mt.state.params)
del mt

deltas = {}
for frac in FRACS:
    n_lab = max(32, int(round(frac * n_tr)))
    bsz = min(64, n_lab)
    # equalize the OPTIMIZATION budget across fractions: ~80 update steps
    # regardless of how few labeled records there are (16 epochs of 87
    # records would be 32 steps -- too few for either arm to converge)
    spe = -(-n_lab // bsz)
    n_ep = max(16, -(-80 // spe))
    for seed in SEEDS:
        lab_idx = np.sort(
            np.random.default_rng(seed).permutation(n_tr)[:n_lab])
        small = SplitData(
            signals=jnp.take(splits.train.signals, jnp.asarray(lab_idx),
                             axis=0),
            labels=splits.train.labels[lab_idx])

        aucs = {}
        for arm in ('scratch', 'ssl'):
            cfg = TrainConfig(num_train_epoch=n_ep, train_batch_size=bsz,
                              eval_batch_size=128, do_eval=False,
                              save_final=False, log_per_epoch=True,
                              log_to_console=False, steps_per_dispatch=4,
                              resident_dtype='float16', learning_rate=3e-4,
                              seed=77 + seed)
            tr = Trainer(model_cfg, cfg, train_data=small,
                         output_dir=f'/tmp/sslfrac-{arm}')
            if arm == 'ssl':
                tr.init_state()
                tr.set_params(transfer_encoder(enc, tr.state.params))
            tr.train()
            aucs[arm] = macro(tr)
            del tr
        d = aucs['ssl'] - aucs['scratch']
        deltas.setdefault(frac, []).append(d)
        print(f'frac={frac:.3%} n={n_lab} seed={seed}: scratch '
              f'{aucs["scratch"]:.4f}  ssl {aucs["ssl"]:.4f}  d={d:+.4f}',
              flush=True)

print()
for frac, ds in deltas.items():
    print(f'frac={frac:.3%}: mean {np.mean(ds):+.4f}  '
          f'min {min(ds):+.4f}  max {max(ds):+.4f}  n={len(ds)}')
