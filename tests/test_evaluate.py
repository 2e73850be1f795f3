"""Offline evaluator (evaluate_trained JSON reports + pick_eval_eg) and the
visualize/evaluate CLI paths."""
import glob
import json
import os
import pickle

import matplotlib
matplotlib.use('Agg')

import numpy as np

from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
from ecg_representation_learning_tpu.data import get_ptbxl_splits, synth_ptbxl
from ecg_representation_learning_tpu.train import Trainer
from ecg_representation_learning_tpu.train.evaluate import evaluate_trained, pick_eval_eg
import pytest


def make_trainer(tmp_path):
    signals, labels, folds = synth_ptbxl(n=96, length=256)
    splits = get_ptbxl_splits(signals, labels, folds)
    cfg = VitConfig.from_defined('debug', max_signal_length=320,
                                 use_flash_attention=False)
    tr = Trainer(cfg, TrainConfig(eval_batch_size=32),
                 eval_data=splits.eval, output_dir=str(tmp_path / 'r'))
    tr.init_state()
    return tr, splits


def test_evaluate_trained_writes_json(tmp_path):
    tr, splits = make_trainer(tmp_path)
    out = evaluate_trained(tr, {'eval': splits.eval, 'test': splits.test},
                           out_dir=str(tmp_path / 'ev'))
    assert os.path.exists(out['_path'])
    with open(out['_path']) as f:
        report = json.load(f)
    for split in ('eval', 'test'):
        assert 'loss' in report[split]
        assert 'macro_auc' in report[split]
        assert 'per_class_auc' in report[split]


def test_pick_eval_eg(tmp_path):
    tr, splits = make_trainer(tmp_path)
    out = pick_eval_eg(tr, {'test': splits.test}, n_each=2,
                       out_dir=str(tmp_path / 'ev'))
    assert set(out['test']) == {'low', 'med', 'high'}
    assert len(out['test']['low']) == 2
    # low-loss samples must actually have lower loss than high-loss ones
    m = tr.evaluate(splits.test, loss_reduction='none')
    losses = m['per_sample_loss']
    assert losses[out['test']['low']].mean() <= losses[out['test']['high']].mean()
    # pickle written
    assert glob.glob(str(tmp_path / 'ev' / 'eval_edge_example_samples*.pkl'))


@pytest.mark.slow  # >13 s measured (round-4 tiering)
def test_cli_visualize(tmp_path):
    from ecg_representation_learning_tpu.cli import main
    import contextlib, io
    os.chdir(tmp_path)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(['--platform', 'cpu', 'visualize', '--size', 'debug',
              '--synth-n', '48', '--split', 'test', '--index', '1'])
    out = json.loads(buf.getvalue())
    assert os.path.exists(out['figure'])


def test_cli_infer(tmp_path):
    """Serving path: unlabeled HDF5 -> per-record top-k code probabilities."""
    import json
    from ecg_representation_learning_tpu.cli import main
    from ecg_representation_learning_tpu.registry import PTBXL_ID2CODE

    main(['synth', '--n', '24', '--out', str(tmp_path)])
    out = str(tmp_path / 'pred.json')
    main(['infer', '--size', 'debug', '--hdf5',
          str(tmp_path / 'PTB-XL-combined.hdf5'), '--top-k', '3',
          '--out', out])
    with open(out) as f:
        res = json.load(f)
    assert res['n_records'] == 24 and res['top_k'] == 3
    for rec in res['records']:
        assert len(rec['top']) == 3
        for entry in rec['top']:
            assert entry['code'] in PTBXL_ID2CODE
            assert 0.0 <= entry['prob'] <= 1.0
    # descending within a record
    p = [e['prob'] for e in res['records'][0]['top']]
    assert p == sorted(p, reverse=True)
