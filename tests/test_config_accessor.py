"""Dot-path config accessor + CheckArg validation (reference API parity)."""
import pytest

from ecg_representation_learning_tpu.registry import config
from ecg_representation_learning_tpu.utils.check_args import ca


def test_config_dot_paths():
    assert config('datasets.PTB-XL.fqs') == 500
    assert config('datasets.PTB-XL.n_rec') == 21837
    assert config('datasets.INCART.fqs') == 257
    assert config('pre_processing.zheng.low_pass.passband') == 50.0
    assert config('pre_processing.zheng.nlm.window_size') == 10
    assert config('random-seed') == 77
    assert len(config('datasets.PTB-XL.code.id2code')) == 71
    assert config('datasets.PTB-XL.code.code2id')['NORM'] == 4
    assert config('datasets-export.total')[0] == 'INCART'
    stats = config('datasets.PTB-XL.train-stats.original.mean')
    assert abs(stats[0] + 0.0019577) < 1e-6


def test_config_unknown_key():
    with pytest.raises(KeyError):
        config('nonexistent.key')


def test_check_args():
    ca(model_size='base', optimizer='AdamW', schedule='cosine',
       dataset_name='PTB-XL', pad_mode='shift')
    with pytest.raises(ValueError):
        ca(optimizer='SGD')
    with pytest.raises(ValueError):
        ca(unknown_category='x')
    with pytest.raises(ValueError):
        ca.check_mismatch('Eval Loss Reduction', 'sum', ['mean', 'none'])
