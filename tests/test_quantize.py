"""Weight-only int8 quantized inference tests (models/quantize.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
from ecg_representation_learning_tpu.data import get_ptbxl_splits, synth_ptbxl
from ecg_representation_learning_tpu.models.quantize import (
    dequantize_params, quantize_params_int8, quantized_bytes)
from ecg_representation_learning_tpu.train import Trainer
import pytest


def make_trainer(tmp_path):
    signals, labels, folds = synth_ptbxl(n=96, length=640)
    splits = get_ptbxl_splits(signals, labels, folds)
    model_cfg = VitConfig.from_defined('debug', max_signal_length=704,
                                       use_flash_attention=False)
    tr = Trainer(model_cfg, TrainConfig(num_train_epoch=1, train_batch_size=32,
                                        eval_batch_size=32, save_final=False,
                                        do_eval=False),
                 train_data=splits.train, eval_data=splits.eval,
                 output_dir=str(tmp_path / 'q'))
    tr.train()
    return tr, splits


def test_quantize_roundtrip_error_bound(tmp_path):
    rng = jax.random.PRNGKey(0)
    params = {'params': {'mlp': {'fc1': {
        'kernel': jax.random.normal(rng, (128, 256)),
        'bias': jnp.zeros((256,))}}}}
    qp, sc = quantize_params_int8(params)
    k = qp['params']['mlp']['fc1']['kernel']
    assert k.dtype == jnp.int8
    assert qp['params']['mlp']['fc1']['bias'].dtype == jnp.float32  # too small
    dq = dequantize_params(qp, sc)
    w = np.asarray(params['params']['mlp']['fc1']['kernel'])
    s = np.asarray(sc['params/mlp/fc1/kernel'])
    # round-to-nearest: |w - dq| <= s/2 elementwise
    err = np.abs(w - np.asarray(dq['params']['mlp']['fc1']['kernel']))
    assert (err <= s / 2 + 1e-7).all()
    # ~4x smaller than f32 storage for the quantized leaf
    assert quantized_bytes(qp) < quantized_bytes(params) / 2


@pytest.mark.slow  # >13 s measured (round-4 tiering)
def test_int8_predict_matches_f32(tmp_path):
    tr, splits = make_trainer(tmp_path)
    x = splits.test.signals[:8]
    probs_f32 = tr.predict(x)
    summary = tr.enable_int8_inference()
    assert summary['compression'] > 2.0
    probs_q = tr.predict(x)
    # per-channel weight-only int8: probabilities stay close
    assert np.abs(probs_q - probs_f32).max() < 0.05
    # top-1 agreement on a trained model
    assert (probs_q.argmax(1) == probs_f32.argmax(1)).mean() >= 0.9
    # quantized evaluate produces a near-identical macro-AUROC
    ev_q = tr.evaluate(splits.eval)
    tr.disable_int8_inference()
    ev_f = tr.evaluate(splits.eval)
    if ev_f['macro_auc'] is not None:
        assert abs(ev_q['macro_auc'] - ev_f['macro_auc']) < 0.02


@pytest.mark.slow  # >13 s measured (round-4 tiering)
def test_int8_refreshes_on_weight_swap(tmp_path):
    # set_params / load_checkpoint must re-quantize the int8 snapshot --
    # a stale snapshot would silently keep serving the pre-swap model
    tr, splits = make_trainer(tmp_path)
    x = splits.test.signals[:4]
    tr.enable_int8_inference()
    probs_old = tr.predict(x)
    zeroed = jax.tree.map(lambda a: np.zeros_like(np.asarray(a)),
                          tr.state.params)
    tr.set_params(zeroed)
    probs_new = tr.predict(x)
    # an all-zero model emits sigmoid(0) = 0.5 everywhere; the stale
    # snapshot would reproduce probs_old instead
    np.testing.assert_allclose(probs_new, 0.5, atol=1e-3)
    assert np.abs(probs_old - 0.5).max() > 0.01

    path = tr.save_checkpoint(tag='zeroed')
    tr2, _ = make_trainer(tmp_path)
    tr2.output_dir = str(tmp_path / 'q2')
    tr2.enable_int8_inference()
    tr2.load_checkpoint(path)
    np.testing.assert_allclose(tr2.predict(x), 0.5, atol=1e-3)
