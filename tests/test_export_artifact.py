"""StableHLO serving-artifact tests (models/export_artifact.py): export a
trained model, reload it from the two files alone, and check the program
reproduces Trainer.predict bit-for-bit semantics (same normalize + pad +
forward + sigmoid)."""
import json
import os

import numpy as np
import pytest

from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
from ecg_representation_learning_tpu.data import get_ptbxl_splits, synth_ptbxl
from ecg_representation_learning_tpu.models.export_artifact import (
    ExportedModel, export_model)
from ecg_representation_learning_tpu.train import Trainer

pytestmark = pytest.mark.slow  # 24 s module fixture (StableHLO export roundtrip)


@pytest.fixture(scope='module')
def trained(tmp_path_factory):
    signals, labels, folds = synth_ptbxl(n=96, length=640)
    splits = get_ptbxl_splits(signals, labels, folds)
    model_cfg = VitConfig.from_defined('debug', max_signal_length=704,
                                       use_flash_attention=False)
    tr = Trainer(model_cfg, TrainConfig(num_train_epoch=1, train_batch_size=32,
                                        eval_batch_size=32, save_final=False,
                                        do_eval=False),
                 train_data=splits.train, eval_data=splits.eval,
                 output_dir=str(tmp_path_factory.mktemp('exp')))
    tr.train()
    return tr, splits


def test_export_roundtrip_parity(trained, tmp_path):
    tr, splits = trained
    path = str(tmp_path / 'artifact')
    meta = export_model(tr, path)
    assert os.path.exists(os.path.join(path, 'model.stablehlo'))
    assert meta['wire']['signal_length'] == 640    # 704 - patch 64
    assert meta['model_config']['num_class'] == tr.model_cfg.num_class

    m = ExportedModel.load(path)
    x = splits.test.signals[:8]
    probs = m.predict(x)
    ref = tr.predict(x)
    assert probs.shape == ref.shape
    np.testing.assert_allclose(probs, ref, atol=1e-5)

    # symbolic batch: any request size runs through the one artifact
    assert m.predict(x[:3]).shape == (3, tr.model_cfg.num_class)
    one = m.predict(x[0])          # (C, L) single record
    np.testing.assert_allclose(one, ref[:1], atol=1e-5)


def test_export_short_record_padding(trained, tmp_path):
    tr, splits = trained
    path = str(tmp_path / 'artifact')
    export_model(tr, path)
    m = ExportedModel.load(path)
    # a shorter record zero-pads to the wire length; the in-program
    # time_end_pad then lands it where Trainer.predict would
    short = splits.test.signals[:2, :, :500]
    probs = m.predict(short)
    assert probs.shape == (2, tr.model_cfg.num_class)
    assert np.isfinite(probs).all() and (probs <= 1).all()
    # too-long records are refused with windowing advice, not truncated
    with pytest.raises(AssertionError, match='wire length'):
        m.predict(np.zeros((1, 12, 4096), np.float32))


def test_export_short_record_nonzero_mean_stats(trained, tmp_path):
    # with non-zero per-lead means (--stats original) the host-side pad must
    # use the MEAN, not raw zeros: the program normalizes BEFORE its own
    # time_end_pad, so only mean-valued samples land as the zero tail
    # training saw (raw zeros would become -mean/std)
    tr, splits = trained
    stats = {'mean': [0.5 + 0.05 * i for i in range(12)],
             'std': [0.2 + 0.01 * i for i in range(12)]}
    tr2 = Trainer(tr.model_cfg, TrainConfig(), norm_stats=stats,
                  output_dir=str(tmp_path / 'tr2'))
    tr2.init_state()
    tr2.set_params(tr.state.params)
    path = str(tmp_path / 'artifact-stats')
    export_model(tr2, path)
    m = ExportedModel.load(path)
    short = splits.test.signals[:2, :, :500]
    # ground truth: extend the record to the wire length with the per-lead
    # mean by hand -- predict() must do exactly this internally
    mean = np.asarray(stats['mean'], np.float32).reshape(1, 12, 1)
    full = np.concatenate(
        [short, np.broadcast_to(mean, (2, 12, m.signal_length - 500))], axis=2)
    np.testing.assert_allclose(m.predict(short), m.predict(full), atol=1e-6)


def test_export_int8_artifact(trained, tmp_path):
    tr, splits = trained
    p32 = str(tmp_path / 'f32')
    p8 = str(tmp_path / 'int8')
    meta32 = export_model(tr, p32)
    meta8 = export_model(tr, p8, int8=True)
    # int8 weights embed ~4x smaller; the debug model is tiny so just
    # require a real reduction
    assert meta8['bytes'] < meta32['bytes'] * 0.55
    m8 = ExportedModel.load(p8)
    x = splits.test.signals[:8]
    ref = tr.predict(x)
    probs = m8.predict(x)
    assert np.abs(probs - ref).max() < 0.05


def test_export_metadata_classes(trained, tmp_path):
    tr, _ = trained
    path = str(tmp_path / 'artifact')
    export_model(tr, path)
    with open(os.path.join(path, 'metadata.json')) as f:
        meta = json.load(f)
    assert len(meta['classes']) == min(tr.model_cfg.num_class, 71)
    assert all({'id', 'code', 'description'} <= set(c) for c in meta['classes'])
    assert meta['norm_stats']['mean'] == [0.0] * 12
