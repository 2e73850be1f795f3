"""MAE pretraining loop + encoder transfer + linear probe tests."""
import numpy as np
import jax
import jax.numpy as jnp

from ecg_representation_learning_tpu.configs import MaeConfig, TrainConfig, VitConfig
from ecg_representation_learning_tpu.data import get_ptbxl_splits, synth_ptbxl
from ecg_representation_learning_tpu.models import EcgMae, EcgVit
from ecg_representation_learning_tpu.train.pretrain import (
    MaeTrainer, make_probe_optimizer, transfer_encoder,
)


MODEL_CFG = VitConfig.from_defined('debug', max_signal_length=320,
                                   use_flash_attention=False)
MAE_CFG = MaeConfig(decoder_hidden_size=64, decoder_num_layers=1,
                    decoder_num_heads=4, decoder_intermediate_size=128)


def test_mae_pretraining_reduces_loss(tmp_path):
    signals, labels, folds = synth_ptbxl(n=128, length=256)
    splits = get_ptbxl_splits(signals, labels, folds)
    cfg = TrainConfig(num_train_epoch=3, train_batch_size=32, learning_rate=2e-3,
                      do_eval=False)
    tr = MaeTrainer(MODEL_CFG, MAE_CFG, cfg, train_data=splits.train,
                    output_dir=str(tmp_path / 'mae'))
    tr.init_state()
    # capture initial loss
    x = jnp.asarray(splits.train.signals[:32])
    from ecg_representation_learning_tpu.train.trainer import _prep_batch
    sig = _prep_batch(x, tr.mean, tr.std, MODEL_CFG.patch_size, train=False)
    loss0 = float(tr.model.apply(tr.state.params, sig,
                                 rngs={'mask': jax.random.PRNGKey(9)}).loss)
    res = tr.train()
    assert np.isfinite(res['loss'])
    assert res['loss'] < loss0  # reconstruction improves


def test_transfer_encoder_and_probe(tmp_path):
    mae = EcgMae(MODEL_CFG, MAE_CFG)
    x = jnp.zeros((1, 12, 320))
    mae_params = mae.init({'params': jax.random.PRNGKey(0),
                           'mask': jax.random.PRNGKey(1)}, x)
    vit = EcgVit(MODEL_CFG)
    vit_params = vit.init({'params': jax.random.PRNGKey(2)}, x)
    merged = transfer_encoder(mae_params, vit_params)

    # trunk weights actually copied
    src = mae_params['params']['encoder_block_0']['attn']['qkv']['kernel']
    dst = merged['params']['encoder']['block_0']['attn']['qkv']['kernel']
    np.testing.assert_array_equal(np.asarray(src), np.asarray(dst))
    src_pe = mae_params['params']['encoder_patch_embed']['proj']['kernel']
    dst_pe = merged['params']['encoder']['patch_embed']['proj']['kernel']
    np.testing.assert_array_equal(np.asarray(src_pe), np.asarray(dst_pe))
    # pos emb rows 1..P copied; forward still works
    out = vit.apply(merged, jnp.zeros((2, 12, 320)))
    assert out.logits.shape == (2, 71)

    # linear probe: only head params move after an update
    import optax
    cfg = TrainConfig(learning_rate=1e-2, warmup_ratio=0.0)
    opt, _ = make_probe_optimizer(cfg, 10, merged)
    opt_state = opt.init(merged)
    labels = jnp.zeros((2, 71))

    def loss_fn(p):
        return vit.apply(p, jnp.ones((2, 12, 320)), labels=labels).loss
    grads = jax.grad(loss_fn)(merged)
    updates, _ = opt.update(grads, opt_state, merged)
    new_params = optax.apply_updates(merged, updates)
    head_moved = not np.allclose(
        np.asarray(new_params['params']['head']['kernel']),
        np.asarray(merged['params']['head']['kernel']))
    trunk_moved = not np.allclose(
        np.asarray(new_params['params']['encoder']['block_0']['attn']['qkv']['kernel']),
        np.asarray(merged['params']['encoder']['block_0']['attn']['qkv']['kernel']))
    assert head_moved and not trunk_moved
