"""On-device hard-corpus generator (data/datasets.py:synth_ptbxl_device):
the signals are synthesized by a jitted chunk program from host-drawn
parameter arrays and stay device-resident end-to-end (splits gather on
device, the trainer's HBM-resident input path consumes them directly).
"""
import jax
import numpy as np

from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
from ecg_representation_learning_tpu.data import (get_ptbxl_splits,
                                                  synth_ptbxl,
                                                  synth_ptbxl_device)
from ecg_representation_learning_tpu.train import Trainer
import pytest


def test_generator_shapes_and_distribution():
    sig, labels, folds = synth_ptbxl_device(n=200, length=500,
                                            n_marker_classes=8, chunk=128)
    assert sig.shape == (200, 12, 500)
    assert not isinstance(sig, np.ndarray)          # device-resident
    arr = np.asarray(sig)
    assert np.isfinite(arr).all()
    # same distribution family as the host hard corpus
    host, _, _ = synth_ptbxl(n=200, length=500, n_marker_classes=8, hard=True)
    assert abs(arr.std() - host.std()) / host.std() < 0.3
    assert len(labels) == 200 and folds.shape == (200,)
    assert all(1 <= f <= 10 for f in folds)
    # long-tailed prevalence: class 0 much more frequent than class 7
    counts = np.zeros(9)
    for l in labels:
        for i in l:
            counts[min(i, 8)] += 1
    assert counts[0] > counts[7]


def test_deterministic_in_seed():
    a, la, fa = synth_ptbxl_device(n=64, length=256, n_marker_classes=4,
                                   chunk=64)
    b, lb, fb = synth_ptbxl_device(n=64, length=256, n_marker_classes=4,
                                   chunk=64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert la == lb and (fa == fb).all()


def test_tail_chunk_padding_consistent():
    """n not a multiple of chunk: the padded tail program must produce the
    same rows as a chunk-aligned run (host params are identical; only the
    on-device noise key schedule differs per chunk boundary -- so compare
    the deterministic part by zero-noise proxy: shapes + finiteness)."""
    sig, labels, folds = synth_ptbxl_device(n=100, length=256,
                                            n_marker_classes=4, chunk=64)
    assert sig.shape == (100, 12, 256)
    assert np.isfinite(np.asarray(sig)).all()


@pytest.mark.slow  # >13 s measured (round-4 tiering)
def test_trainer_consumes_device_corpus():
    sig, labels, folds = synth_ptbxl_device(n=160, length=640,
                                            n_marker_classes=8, chunk=160)
    splits = get_ptbxl_splits(sig, labels, folds)
    assert not isinstance(splits.train.signals, np.ndarray)
    model_cfg = VitConfig.from_defined('debug', max_signal_length=704,
                                       use_flash_attention=False)
    cfg = TrainConfig(num_train_epoch=1, train_batch_size=16,
                      eval_batch_size=32, do_eval=True,
                      log_to_console=False)
    tr = Trainer(model_cfg, cfg, train_data=splits.train,
                 eval_data=splits.eval, output_dir='/tmp/test-devcorpus')
    res = tr.train()
    assert np.isfinite(res['best_eval_loss'])
