"""Trunk-quality ladder: which pretext yields the best transferable trunk?

Round-5 context: the MAE(mask 0.75) trunk's linear probe caps at ~0.63
macro-AUROC on the hard synth corpus while from-scratch supervised training
reaches that with <100 labels, so MAE transfer cannot demonstrably win there
(tools/ssl_frac_probe.py).  MAE loss floors at ~0.916-0.918 whether
pretrained 40 or 80 epochs -- the corpus' masked-reconstruction-learnable
fraction saturates early.  This rig ladders the TRUNK: for each pretext,
pretrain 40 ep, then on the fixed 2%/seed-13 subset measure
  - linear probe (16 ep @ 1e-2, trunk frozen)  -- feature quality
  - full fine-tune (16 ep @ 3e-4)              -- transfer delta vs the
    known scratch anchor 0.7333 (same subset, same seed, same budget)

Arms: mae50 (mask 0.5 -- easier pretext, denser gradient), contrastive
(NT-Xent, the pretext of the SSL paper the reference's metric comes from,
util/train.py:34-40).  mae75 numbers already measured (probe 0.630,
ssl@3e-4 0.7395).

Usage: python tools/ssl_trunk_ladder.py [arms] e.g. mae50,contrastive
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecg_representation_learning_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ecg_representation_learning_tpu.configs import (ContrastiveConfig,  # noqa: E402
                                                     MaeConfig, TrainConfig,
                                                     VitConfig)
from ecg_representation_learning_tpu.data import (get_ptbxl_splits,  # noqa: E402
                                                  synth_ptbxl_device)
from ecg_representation_learning_tpu.train import Trainer  # noqa: E402
from ecg_representation_learning_tpu.train.contrastive import (  # noqa: E402
    ContrastiveTrainer, transfer_contrastive_encoder)
from ecg_representation_learning_tpu.train.metrics import roc_auc  # noqa: E402
from ecg_representation_learning_tpu.train.pretrain import (MaeTrainer,  # noqa: E402
                                                            transfer_encoder)
from ecg_representation_learning_tpu.train.trainer import SplitData  # noqa: E402

K = 16
SEED = 13
ARMS = (sys.argv[1].split(',') if len(sys.argv) > 1
        else ['mae50', 'contrastive'])

signals, labels, folds = synth_ptbxl_device(n=21837, length=2500,
                                            n_marker_classes=K)
splits = get_ptbxl_splits(signals, labels, folds)
del signals
n_tr = len(splits.train)
n_lab = max(64, int(round(0.02 * n_tr)))
lab_idx = np.sort(np.random.default_rng(SEED).permutation(n_tr)[:n_lab])
small = SplitData(
    signals=jnp.take(splits.train.signals, jnp.asarray(lab_idx), axis=0),
    labels=splits.train.labels[lab_idx])
model_cfg = VitConfig.from_defined('base', dtype='bfloat16')
PT_CFG = TrainConfig(num_train_epoch=40, train_batch_size=256,
                     learning_rate=1e-3, do_eval=False, save_final=False,
                     log_per_epoch=True, log_to_console=False,
                     resident_dtype='float16')


def macro(tr):
    ev = tr.evaluate(splits.test, return_predictions=True)
    probs, labs = ev['predictions']['probs'], ev['predictions']['labels']
    aucs = [roc_auc(probs[:, j], labs[:, j]) for j in range(K)]
    return float(np.mean([a for a in aucs if not np.isnan(a)]))


def snap(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def pretrain(arm):
    if arm == 'mae50':
        mt = MaeTrainer(model_cfg, MaeConfig(mask_ratio=0.5), PT_CFG,
                        train_data=splits.train, output_dir='/tmp/ladder-mae50')
    elif arm == 'contrastive':
        mt = ContrastiveTrainer(model_cfg, ContrastiveConfig(), PT_CFG,
                                train_data=splits.train,
                                output_dir='/tmp/ladder-con')
    else:
        raise SystemExit(f'unknown arm {arm}')
    res = mt.train()
    print(f'{arm}: pretrain loss {res["loss"]:.4f}', flush=True)
    enc = snap(mt.state.params)
    del mt
    return enc


def finetune(arm, enc, lr, epochs, probe):
    cfg = TrainConfig(num_train_epoch=epochs, train_batch_size=64,
                      eval_batch_size=128, do_eval=False, save_final=False,
                      log_per_epoch=True, log_to_console=False,
                      steps_per_dispatch=4, resident_dtype='float16',
                      linear_probe=probe, learning_rate=lr, seed=77 + SEED)
    tr = Trainer(model_cfg, cfg, train_data=small,
                 output_dir=f'/tmp/ladder-{arm}-{"probe" if probe else "ft"}')
    tr.init_state()
    xfer = (transfer_contrastive_encoder if arm == 'contrastive'
            else transfer_encoder)
    tr.set_params(xfer(enc, tr.state.params))
    tr.train()
    auc = macro(tr)
    del tr
    return auc


for arm in ARMS:
    enc = pretrain(arm)
    p = finetune(arm, enc, 1e-2, 16, probe=True)
    print(f'{arm}: probe16ep {p:.4f}   (mae75 anchor: 0.630; chance 0.5)',
          flush=True)
    f = finetune(arm, enc, 3e-4, 16, probe=False)
    print(f'{arm}: ssl@3e-4 {f:.4f}   (scratch anchor 0.7333, '
          f'd={f - 0.7333:+.4f})', flush=True)
