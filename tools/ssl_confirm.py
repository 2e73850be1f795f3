"""Seed-stability confirmation for the contrastive SSL-transfer recipe.

Ladder result (tools/ssl_trunk_ladder.py, seed 13, 2% labels): contrastive
trunk probe 0.8224 (> scratch 0.7333!), ft@3e-4 0.7960 (d=+0.0627).  This
rig re-pretrains the same trunk and measures scratch / ssl-ft / probe on the
REMAINING subset seeds to establish the delta's sign stability.

Usage: python tools/ssl_confirm.py [seeds]   e.g. 7,21
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecg_representation_learning_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ecg_representation_learning_tpu.configs import (ContrastiveConfig,  # noqa: E402
                                                     TrainConfig, VitConfig)
from ecg_representation_learning_tpu.data import (get_ptbxl_splits,  # noqa: E402
                                                  synth_ptbxl_device)
from ecg_representation_learning_tpu.train import Trainer  # noqa: E402
from ecg_representation_learning_tpu.train.contrastive import (  # noqa: E402
    ContrastiveTrainer, transfer_contrastive_encoder)
from ecg_representation_learning_tpu.train.metrics import roc_auc  # noqa: E402
from ecg_representation_learning_tpu.train.trainer import SplitData  # noqa: E402

K = 16
SEEDS = [int(s) for s in (sys.argv[1].split(',') if len(sys.argv) > 1
                          else ['7', '21'])]

signals, labels, folds = synth_ptbxl_device(n=21837, length=2500,
                                            n_marker_classes=K)
splits = get_ptbxl_splits(signals, labels, folds)
del signals
n_tr = len(splits.train)
n_lab = max(64, int(round(0.02 * n_tr)))
model_cfg = VitConfig.from_defined('base', dtype='bfloat16')


def macro(tr):
    ev = tr.evaluate(splits.test, return_predictions=True)
    probs, labs = ev['predictions']['probs'], ev['predictions']['labels']
    aucs = [roc_auc(probs[:, j], labs[:, j]) for j in range(K)]
    return float(np.mean([a for a in aucs if not np.isnan(a)]))


mt = ContrastiveTrainer(
    model_cfg, ContrastiveConfig(),
    TrainConfig(num_train_epoch=40, train_batch_size=128, learning_rate=1e-3,
                do_eval=False, save_final=False, log_per_epoch=True,
                log_to_console=False, resident_dtype='float16'),
    train_data=splits.train, output_dir='/tmp/sslconf-mae')
res = mt.train()
print(f'contrastive pretrain loss {res["loss"]:.4f}', flush=True)
enc = jax.tree.map(lambda a: np.asarray(a), mt.state.params)
del mt

for seed in SEEDS:
    lab_idx = np.sort(np.random.default_rng(seed).permutation(n_tr)[:n_lab])
    small = SplitData(
        signals=jnp.take(splits.train.signals, jnp.asarray(lab_idx), axis=0),
        labels=splits.train.labels[lab_idx])
    base_cfg = TrainConfig(num_train_epoch=16, train_batch_size=64,
                           eval_batch_size=128, do_eval=False,
                           save_final=False, log_per_epoch=True,
                           log_to_console=False, steps_per_dispatch=4,
                           resident_dtype='float16', learning_rate=3e-4,
                           seed=77 + seed)
    row = {}
    for arm, cfg in (('scratch', base_cfg),
                     ('ssl-ft', base_cfg),
                     ('probe', dataclasses.replace(base_cfg,
                                                   linear_probe=True,
                                                   learning_rate=1e-2))):
        tr = Trainer(model_cfg, cfg, train_data=small,
                     output_dir=f'/tmp/sslconf-{arm}')
        if arm != 'scratch':
            tr.init_state()
            tr.set_params(transfer_contrastive_encoder(enc, tr.state.params))
        tr.train()
        row[arm] = macro(tr)
        print(f'seed {seed} {arm:8s} {row[arm]:.4f}', flush=True)
        del tr
    print(f'seed {seed}: d(ft)={row["ssl-ft"] - row["scratch"]:+.4f}  '
          f'd(probe)={row["probe"] - row["scratch"]:+.4f}', flush=True)
