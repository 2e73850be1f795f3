"""Sliding-window long-record inference (Trainer.predict_long): records
longer than the model input are windowed, batch-predicted, and aggregated
per class.  The reference stores long corpora (INCART 30-min) but can only
consume 10 s windows manually.
"""
import numpy as np
import pytest

from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
from ecg_representation_learning_tpu.train import Trainer


@pytest.fixture(scope='module')
def trainer():
    cfg = VitConfig.from_defined('debug', max_signal_length=320,
                                 use_flash_attention=False)
    tr = Trainer(cfg, TrainConfig(eval_batch_size=16, log_to_console=False))
    tr.init_state()
    return tr


def test_short_record_passthrough(trainer):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12, 250)).astype(np.float32)
    got = trainer.predict_long(x)
    want = trainer.predict(x)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_long_record_max_agg_covers_every_window(trainer):
    # window = 256 (320 - 64 pad patch); a 1000-sample record
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 12, 1000)).astype(np.float32)
    probs = trainer.predict_long(x, agg='max')
    assert probs.shape == (1, trainer.model_cfg.num_class)
    # max-agg must dominate each individual window's prediction, incl. the
    # tail window the hop grid would otherwise miss
    window, hop = 256, 128
    starts = list(range(0, 1000 - window + 1, hop)) + [1000 - window]
    for s in starts:
        w = trainer.predict(x[:, :, s:s + window])
        assert np.all(probs >= w - 1e-6), f'window at {s} exceeds the max-agg'


def test_mean_agg_and_custom_window(trainer):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 12, 600)).astype(np.float32)
    probs = trainer.predict_long(x, window=200, hop=200, agg='mean')
    # exactly 3 disjoint windows: mean equals the hand-computed mean
    manual = np.mean([trainer.predict(x[:, :, s:s + 200])
                      for s in (0, 200, 400)], axis=0)
    np.testing.assert_allclose(probs, manual, rtol=1e-5)


def test_canonical_length_routes_direct(trainer):
    # the canonical corpus case: window default is 256 (320 - 64) but
    # predict() is LOSSLESS for any L < max_signal_length (always-pad takes
    # 300 -> 320); routing it into two overlapping windows would silently
    # change the probabilities (max-agg bias) and double the compute
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 12, 300)).astype(np.float32)
    np.testing.assert_allclose(trainer.predict_long(x), trainer.predict(x),
                               rtol=1e-6)


def test_exact_max_length_windows_instead_of_crashing(trainer):
    # L == max_signal_length: the always-pad quirk would pad 320 -> 384 past
    # the pos table, so predict() cannot take it -- predict_long must window
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 12, 320)).astype(np.float32)
    probs = trainer.predict_long(x)
    assert probs.shape == (1, trainer.model_cfg.num_class)
    assert np.all((probs >= 0) & (probs <= 1))


def test_explicit_window_honored_below_max(trainer):
    # an explicitly requested window overrides the direct-route heuristic
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 12, 300)).astype(np.float32)
    probs = trainer.predict_long(x, window=150, hop=150, agg='mean')
    manual = np.mean([trainer.predict(x[:, :, s:s + 150])
                      for s in (0, 150)], axis=0)
    np.testing.assert_allclose(probs, manual, rtol=1e-5)


def test_2d_input_promoted(trainer):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((12, 700)).astype(np.float32)
    probs = trainer.predict_long(x)
    assert probs.shape == (1, trainer.model_cfg.num_class)
