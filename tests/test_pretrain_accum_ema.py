"""grad_accum + ema_decay on the pretrainer families (lifted from the
supervised Trainer in round 4 -- VERDICT r3 #4: one loop implementation,
train/loop.py).  The accumulation math itself is parity-proven by
tests/test_accum_ema.py::test_grad_accum_matches_full_batch (same
grad_accum_scan + finish_update); these tests prove the MAE/contrastive
wiring: rng plumbing, EMA recursion, eval/transfer on the EMA weights."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecg_representation_learning_tpu.configs import (ContrastiveConfig,
                                                     MaeConfig, TrainConfig,
                                                     VitConfig)
from ecg_representation_learning_tpu.data import get_ptbxl_splits, synth_ptbxl
from ecg_representation_learning_tpu.train import ContrastiveTrainer
from ecg_representation_learning_tpu.train.pretrain import MaeTrainer

pytestmark = pytest.mark.slow  # trainer-loop scale: excluded from `make test-fast`


def _mk(tmp_path, name, kind='mae', **cfg_kwargs):
    signals, labels, folds = synth_ptbxl(n=96, length=640)
    splits = get_ptbxl_splits(signals, labels, folds)
    model_cfg = VitConfig.from_defined(
        'debug', max_signal_length=704, use_flash_attention=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    kwargs = dict(num_train_epoch=1, train_batch_size=16, eval_batch_size=16,
                  learning_rate=1e-3, save_final=False, do_eval=False)
    kwargs.update(cfg_kwargs)
    if kind == 'contrastive':
        tr = ContrastiveTrainer(model_cfg, ContrastiveConfig(proj_dim=16),
                                TrainConfig(**kwargs),
                                train_data=splits.train, eval_data=splits.eval,
                                output_dir=str(tmp_path / name))
    else:
        tr = MaeTrainer(model_cfg, MaeConfig(decoder_num_layers=1),
                        TrainConfig(**kwargs), train_data=splits.train,
                        eval_data=splits.eval,
                        output_dir=str(tmp_path / name))
    return tr, splits


def test_mae_grad_accum_trains(tmp_path):
    tr, _ = _mk(tmp_path, 'mae_accum', grad_accum=4)
    res = tr.train()
    assert np.isfinite(res['loss'])
    assert int(tr.state.step) == tr.steps_per_epoch


def test_mae_accum_must_divide_batch(tmp_path):
    with pytest.raises(AssertionError):
        _mk(tmp_path, 'bad', grad_accum=5)


def test_mae_ema_recursion_exact(tmp_path):
    """ema_{t} = d*ema_{t-1} + (1-d)*params_t, verified against per-step
    param snapshots -- the EMA tree is a real on-device average, not a copy."""
    d = 0.5
    tr, _ = _mk(tmp_path, 'mae_ema', ema_decay=d)
    tr.init_state()
    tr._build_step()
    leaf = lambda t: np.asarray(
        jax.tree.leaves(t)[0], np.float64)  # first leaf is enough
    ema_expect = leaf(tr.state.params)
    nonf = jnp.zeros((), jnp.int32)
    idx = np.arange(16, dtype=np.int32)
    sigs, take = tr._sig_inputs(tr.train_data, idx)
    for _ in range(3):
        with tr.mesh:
            tr.state, _, nonf = tr._train_step(tr.state, sigs, take, nonf)
        ema_expect = d * ema_expect + (1 - d) * leaf(tr.state.params)
        np.testing.assert_allclose(leaf(tr.state.ema_params), ema_expect,
                                   rtol=1e-5, atol=1e-7)
    # eval runs on the EMA weights
    assert tr._eval_params() is tr.state.ema_params
    loss = tr.evaluate()
    assert np.isfinite(loss)


def test_mae_ema_checkpoint_transfers_to_vit(tmp_path):
    """The SSL -> supervised handoff (load_any_encoder) must consume the EMA
    trunk when the pretrain checkpoint carries one."""
    from ecg_representation_learning_tpu.train.contrastive import \
        load_any_encoder
    tr, _ = _mk(tmp_path, 'mae_handoff', ema_decay=0.9, num_train_epoch=1)
    tr.train()
    # EMA trails raw params after training
    pk = np.asarray(
        tr.state.params['params']['encoder_patch_embed']['proj']['kernel'])
    ek = np.asarray(
        tr.state.ema_params['params']['encoder_patch_embed']['proj']['kernel'])
    assert not np.allclose(pk, ek)
    path = tr.save_checkpoint(tag='ema')

    from ecg_representation_learning_tpu.models.vit import EcgVit
    model_cfg = VitConfig.from_defined(
        'debug', max_signal_length=704, use_flash_attention=False)
    vit = EcgVit(model_cfg)
    vit_params = vit.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 12, 704), jnp.float32))
    moved = load_any_encoder(path, vit_params)
    got = np.asarray(
        moved['params']['encoder']['patch_embed']['proj']['kernel'])
    np.testing.assert_array_equal(got, ek)   # EMA, not raw


def test_contrastive_accum_and_ema(tmp_path):
    tr, _ = _mk(tmp_path, 'con', kind='contrastive', grad_accum=2,
                ema_decay=0.9)
    res = tr.train()
    assert np.isfinite(res['loss'])
    assert tr.state.ema_params is not None
    # EMA trails the raw trunk
    a = np.asarray(jax.tree.leaves(tr.state.params)[0])
    b = np.asarray(jax.tree.leaves(tr.state.ema_params)[0])
    assert not np.allclose(a, b)
    assert np.isfinite(tr.evaluate())
