"""Crash-recovery resume, grad-norm sanitizer, and distributed helpers."""
import numpy as np
import jax
import pytest

from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
from ecg_representation_learning_tpu.data import get_ptbxl_splits, synth_ptbxl
from ecg_representation_learning_tpu.train import Trainer


def setup(tmp_path, epochs, **kw):
    signals, labels, folds = synth_ptbxl(n=96, length=256)
    splits = get_ptbxl_splits(signals, labels, folds)
    model_cfg = VitConfig.from_defined('debug', max_signal_length=320,
                                       use_flash_attention=False)
    kwargs = dict(num_train_epoch=epochs, train_batch_size=32, eval_batch_size=32,
                  do_eval=False, save_every_n_epoch=1)
    kwargs.update(kw)
    return Trainer(model_cfg, TrainConfig(**kwargs), train_data=splits.train,
                   eval_data=splits.eval, output_dir=str(tmp_path / 'run')), splits


def test_auto_resume_continues_from_epoch(tmp_path):
    tr, _ = setup(tmp_path, epochs=2)
    tr.train()
    assert tr.epoch == 2
    steps_after_2 = int(tr.state.step)

    # "crash": new trainer over the same output dir, more epochs, auto-resume
    tr2, _ = setup(tmp_path, epochs=4)
    tr2.train(resume=True)
    assert tr2.epoch == 4
    # resumed from epoch 2, so only 2 more epochs of steps were taken
    assert int(tr2.state.step) == steps_after_2 * 2


def test_resume_false_starts_fresh(tmp_path):
    tr, _ = setup(tmp_path, epochs=1)
    tr.train()
    tr2, _ = setup(tmp_path, epochs=1)
    tr2.train(resume=False)
    assert tr2.epoch == 1


def test_grad_norm_logged_and_finite(tmp_path):
    tr, _ = setup(tmp_path, epochs=1, debug_nans=True)
    tr.train()  # would raise FloatingPointError on non-finite grads


def test_distributed_single_process():
    from ecg_representation_learning_tpu.parallel.distributed import (
        initialize_distributed, process_local_batch_slice)
    info = initialize_distributed()
    assert info['num_processes'] == 1
    assert info['devices'] == 8
    sl = process_local_batch_slice(64)
    assert (sl.start, sl.stop) == (0, 64)
