"""Async checkpointing (train/checkpoint.py AsyncCheckpointer path):
background-written saves restore bit-exactly, restore waits for in-flight
saves, and a Trainer with async_checkpoint=True resumes exactly.
"""
import numpy as np

from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
from ecg_representation_learning_tpu.data import get_ptbxl_splits, synth_ptbxl
from ecg_representation_learning_tpu.train import Trainer
from ecg_representation_learning_tpu.train.checkpoint import (

    restore_checkpoint, save_checkpoint, wait_for_checkpoints)

import pytest

pytestmark = pytest.mark.slow  # trainer-loop scale: excluded from `make test-fast`


def small_trainer(tmp_path, tag, **cfg_kw):
    signals, labels, folds = synth_ptbxl(n=96, length=256)
    splits = get_ptbxl_splits(signals, labels, folds)
    cfg = VitConfig.from_defined('debug', max_signal_length=320,
                                 use_flash_attention=False)
    tcfg = TrainConfig(num_train_epoch=2, train_batch_size=16,
                       eval_batch_size=32, do_eval=False,
                       log_to_console=False, **cfg_kw)
    tr = Trainer(cfg, tcfg, train_data=splits.train, eval_data=splits.eval,
                 output_dir=str(tmp_path / tag))
    return tr, splits


def tree_equal(a, b):
    import jax
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_save_restores_bit_exact(tmp_path):
    tr, _ = small_trainer(tmp_path, 'sync')
    tr.init_state()
    path = str(tmp_path / 'ckpt-async')
    save_checkpoint(path, tr.state, extra={'epoch': 3}, async_save=True)
    # restore_checkpoint must wait for the in-flight background write
    restored, extra = restore_checkpoint(path, tr.state)
    assert extra == {'epoch': 3}
    tree_equal(restored.params, tr.state.params)
    tree_equal(restored.opt_state, tr.state.opt_state)
    wait_for_checkpoints()  # idempotent


def test_trainer_async_checkpoint_resume_parity(tmp_path):
    # run A: async periodic+final checkpoints
    tr, splits = small_trainer(tmp_path, 'a', async_checkpoint=True,
                               save_every_n_epoch=1)
    res = tr.train()
    assert np.isfinite(res['history'][-1]['loss'] if res['history']
                       else tr.evaluate(splits.eval)['loss'])
    # run B: restore ckpt-final into a fresh trainer -> same eval loss
    tr2, _ = small_trainer(tmp_path, 'b')
    tr2.load_checkpoint(str(tmp_path / 'a' / 'ckpt-final'))
    ev_a = tr.evaluate(splits.eval)['loss']
    ev_b = tr2.evaluate(splits.eval)['loss']
    np.testing.assert_allclose(ev_a, ev_b, rtol=1e-6)


def test_latest_committed_skips_orbax_tmp_dirs(tmp_path):
    """A kill mid-save leaves a `*.orbax-checkpoint-tmp-*` sibling dir; the
    crash-recovery resume must pick the last COMMITTED checkpoint, never the
    tmp dir (and ckpt-step{N} names order by step, not mtime)."""
    import os
    import time

    from ecg_representation_learning_tpu.train.checkpoint import (
        latest_committed_checkpoint)
    d = tmp_path / 'out'
    d.mkdir()
    (d / 'ckpt-step10').mkdir()
    time.sleep(0.01)
    (d / 'ckpt-step20').mkdir()
    time.sleep(0.01)
    # the in-flight save dies here: tmp dir is NEWEST by mtime
    (d / 'ckpt-step30.orbax-checkpoint-tmp-1234567').mkdir()
    assert latest_committed_checkpoint(str(d)) == str(d / 'ckpt-step20')
    # step ordering beats mtime ordering
    os.utime(d / 'ckpt-step10')
    assert latest_committed_checkpoint(str(d)) == str(d / 'ckpt-step20')


def test_prune_keeps_newest_step_tags_only(tmp_path):
    """prune_checkpoints drops all but the newest ``keep`` committed
    ckpt-step{N} dirs; user-facing tags (best/final/epoch), in-flight tmp
    dirs, and sidecars of surviving checkpoints are untouched -- the crash
    window is therefore always covered by a committed restore target."""
    import os

    from ecg_representation_learning_tpu.train.checkpoint import (
        committed_checkpoints, latest_committed_checkpoint, prune_checkpoints)
    d = tmp_path / 'out'
    d.mkdir()
    for name in ('ckpt-step2', 'ckpt-step4', 'ckpt-step10', 'ckpt-best',
                 'ckpt-final', 'ckpt-step12.orbax-checkpoint-tmp-99'):
        (d / name).mkdir()
    (d / 'ckpt-step2.meta.json').write_text('{}')
    (d / 'ckpt-step10.meta.json').write_text('{}')
    prune_checkpoints(str(d), keep=2)
    left = sorted(os.listdir(d))
    assert left == ['ckpt-best', 'ckpt-final', 'ckpt-step10',
                    'ckpt-step10.meta.json', 'ckpt-step12.orbax-checkpoint-tmp-99',
                    'ckpt-step4'], left
    # resume target is still the newest committed step
    assert latest_committed_checkpoint(str(d)) == str(d / 'ckpt-step10')
    assert [os.path.basename(p) for p in committed_checkpoints(str(d))] == \
        ['ckpt-best', 'ckpt-final', 'ckpt-step4', 'ckpt-step10']
    # keep=0 clears every step tag but never the named artifacts
    prune_checkpoints(str(d), keep=0)
    assert sorted(p for p in os.listdir(d) if 'tmp' not in p) == \
        ['ckpt-best', 'ckpt-final']


def test_async_meta_sidecar_never_precedes_commit(tmp_path):
    """The .meta.json sidecar of an async save is parked under .pending and
    published only once the checkpoint itself has committed."""
    import json
    import os

    from ecg_representation_learning_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint, wait_for_checkpoints)
    tr, _ = small_trainer(tmp_path, 'meta')
    tr.init_state()
    path = str(tmp_path / 'ckpt-meta')
    save_checkpoint(path, tr.state, extra={'epoch': 9}, async_save=True)
    # immediately after the call returns, the published sidecar must not
    # exist yet (only .pending may)
    assert not os.path.exists(path + '.meta.json')
    wait_for_checkpoints()
    assert os.path.exists(path + '.meta.json')
    assert not os.path.exists(path + '.meta.json.pending')
    with open(path + '.meta.json') as f:
        assert json.load(f) == {'epoch': 9}
    _, extra = restore_checkpoint(path, tr.state)
    assert extra == {'epoch': 9}
