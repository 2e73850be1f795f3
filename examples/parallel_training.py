"""Every parallelism mode the framework ships, on one virtual 8-device mesh.

The reference is strictly single-device (SURVEY.md §2.3); this framework
makes each mode a config change.  Runs on CPU with 8 virtual devices so you
can try it on a laptop; on real hardware drop the env vars and size the mesh
to your slice.

Run:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/parallel_training.py

Modes demonstrated:
  1. DP x TP (+FSDP):  Megatron param sharding over 'model', batch over
     'data', ZeRO-style storage sharding of params + Adam moments
     (TrainConfig.mesh_data / mesh_model / fsdp)
  2. Pipeline parallelism: EcgVit's block stack staged over 'stage'
     (TrainConfig.mesh_stage; train/pipeline_vit.py)
  3. Context parallelism: masked-signal pretraining with the SEQUENCE
     ring-sharded across devices (ring attention; train/long_record.py)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np

    assert len(jax.devices()) >= 8, (
        'need 8 devices: run with '
        'XLA_FLAGS=--xla_force_host_platform_device_count=8')

    from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
    from ecg_representation_learning_tpu.data import get_ptbxl_splits, synth_ptbxl
    from ecg_representation_learning_tpu.train import Trainer

    signals, labels, folds = synth_ptbxl(n=128, length=256)
    splits = get_ptbxl_splits(signals, labels, folds)

    # 1. DP x TP with FSDP ---------------------------------------------------
    model_cfg = VitConfig.from_defined('debug', max_signal_length=320,
                                       use_flash_attention=False)
    cfg = TrainConfig(num_train_epoch=1, train_batch_size=8, eval_batch_size=8,
                      mesh_data=4, mesh_model=2, fsdp=True,
                      save_final=False, log_to_console=False)
    tr = Trainer(model_cfg, cfg, train_data=splits.train,
                 eval_data=splits.eval, output_dir='runs/ex-dp-tp')
    res = tr.train()
    qkv = tr.state.params['params']['encoder']['block_0']['attn']['qkv']['kernel']
    print(f'1. DP(4) x TP(2) + FSDP: eval loss '
          f"{res['history'][-1]['loss']:.4f}; qkv sharding "
          f'{tuple(qkv.sharding.spec)} over mesh {dict(tr.mesh.shape)}')

    # 2. pipeline parallelism ------------------------------------------------
    from ecg_representation_learning_tpu.train.pipeline_vit import (
        PipelineVitTrainer)
    pp_model = VitConfig.from_defined('debug', max_signal_length=320,
                                      use_flash_attention=False,
                                      scan_blocks=True)   # stacked layout
    pp_cfg = TrainConfig(num_train_epoch=1, train_batch_size=16,
                         mesh_data=2, mesh_stage=4, do_eval=False,
                         save_final=False, log_to_console=False)
    pp = PipelineVitTrainer(pp_model, pp_cfg, train_data=splits.train,
                            output_dir='runs/ex-pp')
    pp_res = pp.train()
    stage_qkv = pp.state.params['stages']['attn']['qkv']['kernel']
    print(f"2. DP(2) x PP(4): loss {pp_res['loss']:.4f}; stage params "
          f'{stage_qkv.shape} sharded {tuple(stage_qkv.sharding.spec)}')

    # 3. context parallelism (ring attention) --------------------------------
    from ecg_representation_learning_tpu.parallel import make_mesh
    from ecg_representation_learning_tpu.train.long_record import RingPretrainer
    cp_model = VitConfig.from_defined(
        'debug', max_signal_length=128 * 8, patch_size=64, num_channels=4,
        use_flash_attention=False, ring_axis='data',
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    ring = RingPretrainer(cp_model, TrainConfig(learning_rate=1e-3),
                          make_mesh(n_data=8, n_model=1), seq_axis='data',
                          total_steps=4, output_dir='runs/ex-ring')
    rng = np.random.default_rng(0)
    stream = (rng.standard_normal((2, 4, cp_model.max_signal_length)
                                  ).astype(np.float32) for _ in range(4))
    cp_res = ring.train(stream, steps=4)
    print(f"3. ring CP over 8 sequence shards: losses "
          f"{[round(l, 3) for l in cp_res['losses']]}")


if __name__ == '__main__':
    main()
