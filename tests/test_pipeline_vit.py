"""Pipeline-parallel EcgVit: forward/grad parity vs the plain model, and the
DP x PP trainer (round-3: PP becomes a training mode, not just a verified
building block)."""
import jax
import jax.numpy as jnp
import numpy as np

from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
from ecg_representation_learning_tpu.models.vit import EcgVit, bce_with_logits
from ecg_representation_learning_tpu.train.pipeline_vit import (

    PipelineVitTrainer, make_pp_mesh, merge_vit_params, pipeline_vit_forward,
    split_vit_params,
)

import pytest

pytestmark = pytest.mark.slow  # trainer-loop scale: excluded from `make test-fast`

CFG = VitConfig.from_defined('debug', max_signal_length=320,
                             use_flash_attention=False, scan_blocks=True,
                             hidden_dropout_prob=0.0,
                             attention_probs_dropout_prob=0.0)


def _setup(batch=16):
    model = EcgVit(CFG)
    rng = np.random.default_rng(3)
    sig = jnp.asarray(rng.standard_normal((batch, 12, 320)).astype(np.float32))
    lab = jnp.asarray((rng.uniform(size=(batch, 71)) > 0.9).astype(np.float32))
    variables = model.init({'params': jax.random.PRNGKey(0)}, sig[:1])
    return model, variables, sig, lab


def test_forward_and_grad_parity_vs_plain_model():
    model, variables, sig, lab = _setup()
    mesh = make_pp_mesh(n_stage=4, n_data=2)
    outer, stages = split_vit_params(variables, 4)
    # split/merge round-trips exactly
    merged = merge_vit_params(outer, stages)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ref_logits = model.apply(variables, sig).logits
    pp_logits = pipeline_vit_forward(CFG, outer, stages, sig, mesh, n_micro=8)
    np.testing.assert_allclose(np.asarray(pp_logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=2e-4)

    # grad parity: d loss / d (blocks, patch_embed, head) must match
    def ref_loss(v):
        return bce_with_logits(model.apply(v, sig).logits, lab)

    def pp_loss(params):
        logits = pipeline_vit_forward(CFG, params['outer'], params['stages'],
                                      sig, mesh, n_micro=8)
        return bce_with_logits(logits, lab)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(variables)
    pp_l, pp_g = jax.value_and_grad(pp_loss)(
        {'outer': outer, 'stages': stages})
    np.testing.assert_allclose(float(pp_l), float(ref_l), atol=1e-5, rtol=1e-5)

    ref_blocks = ref_g['params']['encoder']['blocks']
    got_blocks = jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:]),
                              pp_g['stages'])
    for a, b in zip(jax.tree.leaves(got_blocks), jax.tree.leaves(ref_blocks)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(
        np.asarray(pp_g['outer']['params']['encoder']['patch_embed']['proj']['kernel']),
        np.asarray(ref_g['params']['encoder']['patch_embed']['proj']['kernel']),
        atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(
        np.asarray(pp_g['outer']['params']['head']['kernel']),
        np.asarray(ref_g['params']['head']['kernel']),
        atol=5e-4, rtol=5e-3)


def test_pipeline_dropout_rng_path():
    do_cfg = VitConfig.from_defined(
        'debug', max_signal_length=320, use_flash_attention=False,
        scan_blocks=True, hidden_dropout_prob=0.3,
        attention_probs_dropout_prob=0.1)
    model, variables, sig, _ = _setup()
    mesh = make_pp_mesh(n_stage=4, n_data=2)
    outer, stages = split_vit_params(variables, 4)
    det = pipeline_vit_forward(do_cfg, outer, stages, sig, mesh, n_micro=8,
                               deterministic=True)
    sto = pipeline_vit_forward(do_cfg, outer, stages, sig, mesh, n_micro=8,
                               deterministic=False,
                               rng=jax.random.PRNGKey(5))
    sto2 = pipeline_vit_forward(do_cfg, outer, stages, sig, mesh, n_micro=8,
                                deterministic=False,
                                rng=jax.random.PRNGKey(6))
    assert np.isfinite(np.asarray(sto)).all()
    assert not np.allclose(np.asarray(det), np.asarray(sto))   # dropout acts
    assert not np.allclose(np.asarray(sto), np.asarray(sto2))  # rng-dependent


def test_pipeline_trainer_dp_pp(tmp_path):
    from ecg_representation_learning_tpu.data import get_ptbxl_splits, synth_ptbxl

    signals, labels, folds = synth_ptbxl(n=96, length=256)
    splits = get_ptbxl_splits(signals, labels, folds)
    cfg = TrainConfig(num_train_epoch=4, train_batch_size=16, mesh_data=2,
                      mesh_stage=4, learning_rate=1e-3, do_eval=False)
    tr = PipelineVitTrainer(CFG, cfg, train_data=splits.train,
                            output_dir=str(tmp_path / 'pp'))
    tr.init_state()
    # stage params physically sharded over 'stage'
    qkv = tr.state.params['stages']['attn']['qkv']['kernel']
    assert 'stage' in [s for s in qkv.sharding.spec if s]
    # ... and their Adam moments too
    from ecg_representation_learning_tpu.train.optim import adam_moments
    mu, _ = adam_moments(tr.state.opt_state)
    mu_qkv = mu['stages']['attn']['qkv']['kernel']
    assert 'stage' in [s for s in mu_qkv.sharding.spec if s]

    # checkpoint round-trip: stage-sharded state saves and restores exactly,
    # re-placed onto the mesh (stages stay P('stage'))
    import numpy as _np
    tr.save_checkpoint(tag='t')
    tr2 = PipelineVitTrainer(CFG, cfg, train_data=splits.train,
                             output_dir=str(tmp_path / 'pp'))
    tr2.load_checkpoint(str(tmp_path / 'pp' / 'ckpt-t'))
    q1 = _np.asarray(tr.state.params['stages']['attn']['qkv']['kernel'])
    q2 = _np.asarray(tr2.state.params['stages']['attn']['qkv']['kernel'])
    _np.testing.assert_array_equal(q1, q2)
    assert 'stage' in [
        s for s in tr2.state.params['stages']['attn']['qkv']['kernel']
        .sharding.spec if s]
    mu2, _ = adam_moments(tr2.state.opt_state)
    mu1, _ = adam_moments(tr.state.opt_state)
    _np.testing.assert_array_equal(
        _np.asarray(mu1['stages']['attn']['qkv']['kernel']),
        _np.asarray(mu2['stages']['attn']['qkv']['kernel']))

    # initial loss from the merged (plain) model, for a fall check
    model = EcgVit(CFG)
    x = jnp.asarray(splits.train.signals[:32, :, :320])
    y = jnp.asarray(splits.train.labels[:32])
    loss0 = float(model.apply(tr.merged_params(), x, labels=y).loss)
    res = tr.train()
    assert np.isfinite(res['loss'])
    loss1 = float(model.apply(tr.merged_params(), x, labels=y).loss)
    assert loss1 < loss0  # pipelined updates actually train the model


def test_cli_train_mesh_stage(tmp_path):
    # `cli train --mesh-stage 4`: pipeline-parallel training mode end-to-end
    # through the CLI, eval via the merged plain model
    import contextlib
    import io
    import json

    from ecg_representation_learning_tpu.cli import main
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        main(['--platform', 'cpu', 'train', '--size', 'debug',
              '--synth-n', '96', '--epochs', '1', '--batch-size', '16',
              '--mesh-stage', '4', '--output-dir', str(tmp_path / 'pp')])
    info = json.loads(out.getvalue())
    assert np.isfinite(info['train_loss'])
    assert info['mesh'] == '2 data x 4 stage'
    assert info['test_macro_auc'] is None or 0.0 <= info['test_macro_auc'] <= 1.0


def test_cli_synth_hard(tmp_path):
    import contextlib
    import io
    import json
    import os

    from ecg_representation_learning_tpu.cli import main
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        main(['synth', '--n', '48', '--marker-classes', '4', '--hard',
              '--out', str(tmp_path)])
    info = json.loads(out.getvalue())
    assert os.path.exists(info['hdf5']) and os.path.exists(info['labels_csv'])


def test_pipeline_trainer_rejects_subbatch_split(tmp_path):
    """A split smaller than one batch must fail loudly at train() start (the
    round-3 review found a NameError at epoch end instead)."""
    import pytest

    from ecg_representation_learning_tpu.data import (get_ptbxl_splits,
                                                      synth_ptbxl)
    signals, labels, folds = synth_ptbxl(n=24, length=256)
    splits = get_ptbxl_splits(signals, labels, folds)
    cfg = TrainConfig(num_train_epoch=1, train_batch_size=64, mesh_data=2,
                      mesh_stage=4, do_eval=False)
    tr = PipelineVitTrainer(CFG, cfg, train_data=splits.train,
                            output_dir=str(tmp_path / 'pp-small'))
    with pytest.raises(ValueError, match='smaller than one batch'):
        tr.train()


def test_cli_train_mesh_stage_resume(tmp_path):
    """--resume-from is honored in pipeline mode (the round-3 review found
    the pp branch returned before the checkpoint flags took effect)."""
    import contextlib
    import io
    import json

    from ecg_representation_learning_tpu.cli import main
    d = str(tmp_path / 'pp-resume')
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        main(['--platform', 'cpu', 'train', '--size', 'debug',
              '--synth-n', '96', '--epochs', '1', '--batch-size', '16',
              '--mesh-stage', '4', '--output-dir', d])
    first = json.loads(out.getvalue())
    out2 = io.StringIO()
    with contextlib.redirect_stdout(out2):
        main(['--platform', 'cpu', 'train', '--size', 'debug',
              '--synth-n', '96', '--epochs', '1', '--batch-size', '16',
              '--mesh-stage', '4', '--output-dir', d,
              '--resume-from', f'{d}/ckpt-final'])
    second = json.loads(out2.getvalue())
    assert np.isfinite(first['train_loss']) and np.isfinite(second['train_loss'])
    # the resumed run continues from trained weights: its loss is
    # (weakly) below the fresh run's
    assert second['train_loss'] <= first['train_loss'] + 1e-3
