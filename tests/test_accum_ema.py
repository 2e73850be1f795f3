"""Gradient accumulation + parameter-EMA tests (production training features
beyond the reference's MyTrainer, models/train.py:195-404)."""
import dataclasses

import jax
import numpy as np
import pytest

from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
from ecg_representation_learning_tpu.data import get_ptbxl_splits, synth_ptbxl
from ecg_representation_learning_tpu.train import Trainer

pytestmark = pytest.mark.slow  # trainer-loop scale: excluded from `make test-fast`


def setup(tmp_path, name, **cfg_kwargs):
    signals, labels, folds = synth_ptbxl(n=96, length=640)
    splits = get_ptbxl_splits(signals, labels, folds)
    # deterministic model: accumulation parity must not depend on rng use
    model_cfg = VitConfig.from_defined(
        'debug', max_signal_length=704, use_flash_attention=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    kwargs = dict(num_train_epoch=1, train_batch_size=32, eval_batch_size=32,
                  learning_rate=1e-3, augment_timeout=False,
                  save_final=False, do_eval=False)
    kwargs.update(cfg_kwargs)
    tr = Trainer(model_cfg, TrainConfig(**kwargs), train_data=splits.train,
                 eval_data=splits.eval, output_dir=str(tmp_path / name))
    return tr, splits


def test_grad_accum_matches_full_batch(tmp_path):
    # mean-of-microbatch-grads == full-batch grad for the mean-reduced BCE:
    # one epoch with accum=4 lands on the same params as accum=1
    tr1, _ = setup(tmp_path, 'full')
    tr4, _ = setup(tmp_path, 'accum', grad_accum=4)
    tr1.train()
    tr4.train()
    flat1 = jax.tree.leaves(tr1.state.params)
    flat4 = jax.tree.leaves(tr4.state.params)
    for a, b in zip(flat1, flat4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_grad_accum_must_divide_batch(tmp_path):
    with pytest.raises(AssertionError):
        setup(tmp_path, 'bad', grad_accum=5)


def test_ema_tracks_checkpoints_and_serves(tmp_path):
    tr, splits = setup(tmp_path, 'ema', ema_decay=0.9, save_final=True,
                       num_train_epoch=2)
    res = tr.train()
    st = tr.state
    assert st.ema_params is not None
    # EMA trails the raw params (they moved, the average lags)
    head_p = np.asarray(st.params['params']['head']['kernel'])
    head_e = np.asarray(st.ema_params['params']['head']['kernel'])
    assert not np.allclose(head_p, head_e)
    assert np.linalg.norm(head_e) > 0
    # evaluation/inference run on the EMA weights
    assert tr._eval_params() is st.ema_params
    # checkpoint round-trip restores the EMA tree bit-exactly
    path = tr.save_checkpoint(tag='emart')
    tr2, _ = setup(tmp_path, 'ema2', ema_decay=0.9)
    tr2.load_checkpoint(path)
    for a, b in zip(jax.tree.leaves(st.ema_params),
                    jax.tree.leaves(tr2.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and inference runs on them
    probs = tr2.predict(splits.test.signals[:4])
    assert probs.shape == (4, 71) and np.isfinite(probs).all()


def test_ema_checkpoint_layout_skew(tmp_path):
    # pre-EMA checkpoint -> EMA trainer: EMA seeded from the restored params;
    # EMA checkpoint -> non-EMA trainer: EMA dropped.  Both resume cleanly.
    tr_plain, _ = setup(tmp_path, 'plain')
    tr_plain.init_state()
    p_old = tr_plain.save_checkpoint(tag='old')
    tr_ema, _ = setup(tmp_path, 'into_ema', ema_decay=0.99)
    tr_ema.load_checkpoint(p_old)
    for a, b in zip(jax.tree.leaves(tr_ema.state.ema_params),
                    jax.tree.leaves(tr_ema.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    p_ema = tr_ema.save_checkpoint(tag='withema')
    tr_back, _ = setup(tmp_path, 'back_plain')
    tr_back.load_checkpoint(p_ema)
    assert tr_back.state.ema_params is None
    for a, b in zip(jax.tree.leaves(tr_back.state.params),
                    jax.tree.leaves(tr_ema.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # 'resume cleanly' means TRAINING resumes: the skewed-restore fallback
    # must rebuild the opt_state in the live optimizer's container types
    # (the raw orbax restore returns plain dicts -- a dict opt_state crashes
    # the first step's state.count access)
    from ecg_representation_learning_tpu.train.optim import FusedAdamWState
    assert isinstance(tr_back.state.opt_state, FusedAdamWState)
    assert isinstance(tr_ema.state.opt_state, FusedAdamWState)
    tr_back.train()
    tr_ema2, _ = setup(tmp_path, 'into_ema2', ema_decay=0.99)
    tr_ema2.load_checkpoint(p_old)
    tr_ema2.train()


def test_set_params_reseeds_ema(tmp_path):
    # transfer-learning handoff (--init-encoder/--port-checkpoint): the EMA
    # must follow the installed weights, not keep averaging the discarded
    # random init (which would score evals on near-random params)
    tr, _ = setup(tmp_path, 'handoff', ema_decay=0.999)
    tr.init_state()
    new = jax.tree.map(lambda a: np.asarray(a) + 1.0, tr.state.params)
    tr.set_params(new)
    for a, b in zip(jax.tree.leaves(tr.state.ema_params),
                    jax.tree.leaves(tr.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_off_adds_no_state(tmp_path):
    tr, _ = setup(tmp_path, 'noema')
    tr.init_state()
    assert tr.state.ema_params is None
    assert tr._eval_params() is tr.state.params
