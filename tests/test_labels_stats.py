"""PTB-XL label export + train-stat computation (registry generators)."""
import numpy as np
import pandas as pd

from ecg_representation_learning_tpu.data.datasets import (
    compute_train_stats, export_ptbxl_labels,
)


def test_export_ptbxl_labels(tmp_path):
    db = pd.DataFrame({
        'ecg_id': [1, 2, 3],
        'patient_id': [10.0, 11.0, 12.0],
        'scp_codes': ["{'NORM': 100.0, 'SR': 0.0}", "{'IMI': 80.0}", "{}"],
        'strat_fold': [1, 9, 10],
    })
    src = tmp_path / 'ptbxl_database.csv'
    db.to_csv(src, index=False)
    out = export_ptbxl_labels(str(src), str(tmp_path / 'labels.csv'))
    df = pd.read_csv(out)
    assert list(df['strat_fold']) == [1, 9, 10]
    import ast
    labels = [ast.literal_eval(s) for s in df['labels']]
    assert labels[0] == [4, 59]   # NORM=4, SR=59
    assert labels[1] == [5]       # IMI
    assert labels[2] == []


def test_compute_train_stats(rng):
    n = 40
    signals = rng.standard_normal((n, 12, 50)).astype(np.float32) * 2 + 1
    folds = np.concatenate([np.full(30, 3), np.full(5, 9), np.full(5, 10)])
    stats = compute_train_stats(signals, folds)
    assert len(stats['mean']) == 12 and len(stats['std']) == 12
    want_mean = signals[:30].astype(np.float64).mean(axis=(0, 2))
    np.testing.assert_allclose(stats['mean'], want_mean, rtol=1e-6)
    # eval/test rows must NOT influence the stats
    signals2 = signals.copy()
    signals2[30:] += 100.0
    stats2 = compute_train_stats(signals2, folds)
    np.testing.assert_allclose(stats2['mean'], stats['mean'], rtol=1e-6)
