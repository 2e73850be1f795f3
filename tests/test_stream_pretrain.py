"""Streaming MAE pretrain over raw shards with on-the-fly preprocessing."""
import numpy as np
import jax.numpy as jnp

from ecg_representation_learning_tpu.configs import MaeConfig, TrainConfig, VitConfig
from ecg_representation_learning_tpu.data import (
    ShardedRecordStream, prefetch_to_device, write_combined_hdf5,
)
from ecg_representation_learning_tpu.train.pretrain import MaeTrainer


def test_stream_pretrain_raw_500hz(tmp_path, rng):
    # shards of RAW 500 Hz records; pipeline resamples+filters on device
    paths = [write_combined_hdf5(str(tmp_path / f's{i}.hdf5'),
                                 rng.standard_normal((24, 12, 512)).astype(np.float32),
                                 fqs=500)
             for i in range(2)]
    stream = ShardedRecordStream(paths, batch_size=8, loop=True)
    model_cfg = VitConfig.from_defined('debug', max_signal_length=256,
                                       use_flash_attention=False)
    mae_cfg = MaeConfig(decoder_hidden_size=64, decoder_num_layers=1,
                        decoder_num_heads=4, decoder_intermediate_size=128)
    cfg = TrainConfig(learning_rate=1e-3)
    tr = MaeTrainer(model_cfg, mae_cfg, cfg, output_dir=str(tmp_path / 'mae'))
    tr.init_state()
    # 512 raw @500Hz -> 256 @250Hz -> pad to 320 -> crop to max_signal_length 256
    res = tr.train_stream(prefetch_to_device(iter(stream), depth=2),
                          total_steps=6, raw_fqs=500, log_every=3)
    assert np.isfinite(res['loss'])
    assert res['steps'] == 6
    assert res['timer']['steps'] == 6
