"""End-to-end programmatic quickstart (the role of the reference's notebooks).

Covers the full workflow on a synthetic PTB-XL-shaped corpus:
  1. build splits                     (data)
  2. supervised fine-tune + eval      (train.Trainer, macro-AUROC)
  3. MAE pretrain -> linear probe     (train.pretrain)
  4. tokenize                         (models.tokenizer)
  5. attention rollout figure         (utils.rollout)

Run:  python examples/quickstart.py [--platform cpu]
(With real data, swap synth_ptbxl for data.load_ptbxl_from_export.)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--platform', default=None)
    ap.add_argument('--n', type=int, default=256)
    ap.add_argument('--epochs', type=int, default=2)
    args = ap.parse_args()

    from ecg_representation_learning_tpu.runtime import enable_compilation_cache, force_platform
    force_platform(args.platform)
    enable_compilation_cache()

    import numpy as np
    import matplotlib
    matplotlib.use('Agg')

    # 1. data ---------------------------------------------------------------
    from ecg_representation_learning_tpu.data import get_ptbxl_splits, synth_ptbxl
    signals, labels, folds = synth_ptbxl(n=args.n, length=2500)
    splits = get_ptbxl_splits(signals, labels, folds)
    print(f'splits: train={len(splits.train)} eval={len(splits.eval)} '
          f'test={len(splits.test)}')

    # 2. supervised fine-tune ----------------------------------------------
    from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
    from ecg_representation_learning_tpu.train import Trainer
    model_cfg = VitConfig.from_defined('tiny')
    cfg = TrainConfig(num_train_epoch=args.epochs, train_batch_size=32,
                      eval_batch_size=64, learning_rate=1e-3)
    tr = Trainer(model_cfg, cfg, train_data=splits.train, eval_data=splits.eval,
                 output_dir='runs/quickstart')
    result = tr.train()
    test = tr.evaluate(splits.test)
    print('supervised: best eval loss %.4f, test macro-AUROC %s'
          % (result['best_eval_loss'], test['macro_auc']))

    # 3. MAE pretrain + probe ----------------------------------------------
    from ecg_representation_learning_tpu.configs import MaeConfig
    from ecg_representation_learning_tpu.train.pretrain import MaeTrainer, transfer_encoder
    mae = MaeTrainer(model_cfg, MaeConfig(), cfg, train_data=splits.train,
                     output_dir='runs/quickstart-mae')
    mae_result = mae.train()
    print('mae pretrain loss %.4f' % mae_result['loss'])
    import jax
    vit_params = tr.model.init({'params': jax.random.PRNGKey(0)},
                               np.zeros((1, 12, model_cfg.max_signal_length),
                                        np.float32))
    merged = transfer_encoder(mae.state.params, vit_params)
    print('pretrained encoder transferred into a fresh classifier')

    # 4. tokenizer ----------------------------------------------------------
    from ecg_representation_learning_tpu.models.tokenizer import EcgTokenizer
    tok = EcgTokenizer(k=8).fit(splits.train.signals[:64], n_clusters=64, n_iter=32)
    ids, means = tok(splits.test.signals[:4])
    rf = tok.rank_frequency()
    print('tokenizer: %d clusters, power-law exponent %.2f, ids %s'
          % (tok.centers.shape[0], rf['exponent'], ids.shape))

    # 5. rollout figure -----------------------------------------------------
    from ecg_representation_learning_tpu.utils import EcgVitVisualizer
    sig = splits.test.signals[0]
    sig = np.pad(sig, [(0, 0), (0, model_cfg.patch_size - sig.shape[-1]
                                % model_cfg.patch_size)])
    path = EcgVitVisualizer(tr.model, tr.state.params)(
        sig[:, :model_cfg.max_signal_length], splits.test.labels[0], save=True)
    print('rollout figure:', path)


if __name__ == '__main__':
    main()
