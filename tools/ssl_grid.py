"""SSL-transfer recipe grid: find the SEED-STABLE fine-tune protocol.

Round-5 finding that motivates this rig: with the naive recipe (pretrained
trunk + fresh head, full fine-tune at lr 3e-4) the delta vs scratch flips
sign across label-subset seeds (+0.050 seed 7, -0.062 seed 13) even though
the frozen-trunk linear probe scores 0.63 >> chance -- i.e. the trunk
features are real but full fine-tuning with a random head can destroy them
(the LP-FT effect, Kumar et al. 2022).  Arms, all at the SAME step budget
per arm class:

  scratch    fresh init, 16 ep @ lr 3e-4 (scratch's tuned recipe)
  ssl3e4     pretrained trunk + fresh head, 16 ep @ 3e-4 (the naive recipe)
  ssl1e4     same, 16 ep @ 1e-4 (does a gentler lr alone preserve features?)
  lpft       probe 8 ep @ 1e-2 (trunk frozen) -> full ft 16 ep @ 1e-4

One MAE pretrain (40 ep, lr 1e-3) shared by every arm and seed.
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
SEEDS = [int(s) for s in (sys.argv[1].split(',') if len(sys.argv) > 1
                          else ['13', '7', '21'])]
FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02

signals, labels, folds = synth_ptbxl_device(n=21837, length=2500,
                                            n_marker_classes=K)
splits = get_ptbxl_splits(signals, labels, folds)
del signals
n_tr = len(splits.train)
n_lab = max(64, int(round(FRAC * n_tr)))
model_cfg = VitConfig.from_defined('base', dtype='bfloat16')


def macro(tr):
    ev = tr.evaluate(splits.test, return_predictions=True)
    probs, labs = ev['predictions']['probs'], ev['predictions']['labels']
    aucs = [roc_auc(probs[:, j], labs[:, j]) for j in range(K)]
    return float(np.mean([a for a in aucs if not np.isnan(a)]))


def snap(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def train_arm(name, small, lr, epochs, init_params=None, probe=False,
              seed=77):
    cfg = TrainConfig(num_train_epoch=epochs, train_batch_size=64,
                      eval_batch_size=128, do_eval=False, save_final=False,
                      log_per_epoch=True, log_to_console=False,
                      steps_per_dispatch=4, resident_dtype='float16',
                      linear_probe=probe, learning_rate=lr, seed=seed)
    tr = Trainer(model_cfg, cfg, train_data=small,
                 output_dir=f'/tmp/sslgrid-{name}')
    if init_params is not None:
        tr.init_state()
        tr.set_params(init_params)
    tr.train()
    return tr


# --- one shared pretrain ---------------------------------------------------
mt = MaeTrainer(model_cfg, MaeConfig(mask_ratio=0.75),
                TrainConfig(num_train_epoch=40, train_batch_size=256,
                            learning_rate=1e-3, do_eval=False,
                            save_final=False, log_per_epoch=True,
                            log_to_console=False, resident_dtype='float16'),
                train_data=splits.train, output_dir='/tmp/sslgrid-mae')
res = mt.train()
print(f'pretrain loss {res["loss"]:.4f}', flush=True)
enc = snap(mt.state.params)
del mt

results = {}
for seed in SEEDS:
    lab_idx = np.sort(np.random.default_rng(seed).permutation(n_tr)[:n_lab])
    small = SplitData(
        signals=jnp.take(splits.train.signals, jnp.asarray(lab_idx), axis=0),
        labels=splits.train.labels[lab_idx])
    row = {}

    tr = train_arm(f's{seed}-scratch', small, 3e-4, 16, seed=77 + seed)
    row['scratch'] = macro(tr)
    print(f'seed {seed} scratch   {row["scratch"]:.4f}', flush=True)
    del tr

    base = Trainer(model_cfg, TrainConfig(train_batch_size=64),
                   train_data=small, output_dir='/tmp/sslgrid-tmpl')
    base.init_state()
    ssl_init = snap(transfer_encoder(enc, base.state.params))
    del base

    tr = train_arm(f's{seed}-ssl3e4', small, 3e-4, 16, init_params=ssl_init,
                   seed=77 + seed)
    row['ssl3e4'] = macro(tr)
    print(f'seed {seed} ssl@3e-4  {row["ssl3e4"]:.4f}  '
          f'(d={row["ssl3e4"] - row["scratch"]:+.4f})', flush=True)
    del tr

    tr = train_arm(f's{seed}-ssl1e4', small, 1e-4, 16, init_params=ssl_init,
                   seed=77 + seed)
    row['ssl1e4'] = macro(tr)
    print(f'seed {seed} ssl@1e-4  {row["ssl1e4"]:.4f}  '
          f'(d={row["ssl1e4"] - row["scratch"]:+.4f})', flush=True)
    del tr

    tr = train_arm(f's{seed}-probe', small, 1e-2, 8, init_params=ssl_init,
                   probe=True, seed=77 + seed)
    row['probe'] = macro(tr)
    lpft_init = snap(tr.state.params)
    print(f'seed {seed} probe8ep  {row["probe"]:.4f}', flush=True)
    del tr

    tr = train_arm(f's{seed}-lpft', small, 1e-4, 16, init_params=lpft_init,
                   seed=77 + seed)
    row['lpft'] = macro(tr)
    print(f'seed {seed} lp-ft     {row["lpft"]:.4f}  '
          f'(d={row["lpft"] - row["scratch"]:+.4f})', flush=True)
    del tr

    results[seed] = row

print('\nseed  scratch  ssl@3e-4  ssl@1e-4  probe  lp-ft   d(3e4)  d(1e4)  d(lpft)')
for s, r in results.items():
    print(f'{s:4d}  {r["scratch"]:.4f}  {r["ssl3e4"]:.4f}   {r["ssl1e4"]:.4f}'
          f'   {r["probe"]:.4f}  {r["lpft"]:.4f}'
          f'  {r["ssl3e4"]-r["scratch"]:+.4f} {r["ssl1e4"]-r["scratch"]:+.4f}'
          f' {r["lpft"]-r["scratch"]:+.4f}', flush=True)
for arm in ('ssl3e4', 'ssl1e4', 'lpft'):
    ds = [r[arm] - r['scratch'] for r in results.values()]
    print(f'{arm}: mean delta {np.mean(ds):+.4f}  min {min(ds):+.4f}  '
          f'max {max(ds):+.4f}')
