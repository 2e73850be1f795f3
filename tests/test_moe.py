"""Mixture-of-Experts (Switch routing + expert parallelism) tests.

The reference has no MoE (largest model is the dense 300M ViT,
ecg_vit.py:87-91); models/moe.py is a scale-out capability of the TPU
rebuild.  Covered here: dense-math parity of the einsum dispatch/combine
formulation, capacity-overflow residual fallback, the load-balance aux loss,
expert-parallel sharding over the 'model' mesh axis, and an end-to-end
supervised training run on a DP x TP/EP mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
from ecg_representation_learning_tpu.data import get_ptbxl_splits, synth_ptbxl
from ecg_representation_learning_tpu.models.moe import MoeMlp, apply_with_moe
from ecg_representation_learning_tpu.models.vit import EcgVit
from ecg_representation_learning_tpu.parallel import make_mesh, param_shardings
from ecg_representation_learning_tpu.train import Trainer

pytestmark = pytest.mark.slow  # trainer-loop scale: excluded from `make test-fast`


def tiny_cfg(**kw):
    base = dict(num_channels=3, max_signal_length=320, patch_size=32,
                hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=64, use_flash_attention=False,
                moe_num_experts=4, moe_every=2)
    base.update(kw)
    return VitConfig(**base)


def test_moe_mlp_matches_dense_routing_math():
    # ample capacity (no drops): the (S,E,C) einsum dispatch/combine must equal
    # the per-token dense computation gate * FFN_{argmax expert}(x)
    cfg = tiny_cfg(moe_capacity_factor=4.0, hidden_dropout_prob=0.0)
    mod = MoeMlp(cfg)
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 10, cfg.hidden_size))
    variables = mod.init({'params': rng}, x, deterministic=True)
    p = variables['params']
    with jax.default_matmul_precision('highest'):
        y = mod.apply({'params': p}, x, deterministic=True)

        xs = x.reshape(-1, cfg.hidden_size)
        logits = xs @ p['router']['kernel']
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        expert = probs.argmax(-1)
        gate = probs.max(-1)
        ref = []
        for i in range(xs.shape[0]):
            e = int(expert[i])
            h = jax.nn.gelu(xs[i] @ p['w1'][e] + p['b1'][e], approximate=False)
            ref.append(gate[i] * (h @ p['w2'][e] + p['b2'][e]))
        ref = jnp.stack(ref).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_moe_capacity_overflow_drops_to_zero():
    # cap = ceil(cf*S/E); tokens past an expert's buffer contribute 0 (their
    # transformer block reduces to the residual connection)
    cfg = tiny_cfg(moe_num_experts=2, moe_capacity_factor=0.25,
                   hidden_dropout_prob=0.0)
    mod = MoeMlp(cfg)
    rng = jax.random.PRNGKey(2)
    s = 16
    x = jax.random.normal(rng, (1, s, cfg.hidden_size))
    variables = mod.init({'params': rng}, x, deterministic=True)
    p = variables['params']
    y = mod.apply({'params': p}, x, deterministic=True)[0]
    # recompute routing to find dropped tokens
    xs = x.reshape(-1, cfg.hidden_size)
    probs = jax.nn.softmax((xs @ p['router']['kernel']).astype(jnp.float32), -1)
    onehot = jax.nn.one_hot(probs.argmax(-1), 2)
    pos = ((jnp.cumsum(onehot, 0) - 1) * onehot).sum(-1)
    cap = max(1, int(np.ceil(0.25 * s / 2)))
    dropped = np.asarray(pos >= cap)
    assert dropped.any(), 'test setup should overflow the capacity buffer'
    np.testing.assert_allclose(np.asarray(y)[dropped], 0.0, atol=1e-6)
    kept_norms = np.linalg.norm(np.asarray(y)[~dropped], axis=-1)
    assert (kept_norms > 1e-4).all()


def test_moe_capacity_ceil_not_truncated():
    # cap must be ceil(cf*S/E) -- int(cf*S) BEFORE the division shorts the
    # buffer whenever floor(cf*S) crosses down past a multiple of E.
    # cf=0.45, S=10, E=2: correct cap = ceil(4.5/2) = 3; the truncating
    # formula gives ceil(int(4.5)/2) = 2.  Route everything to expert 0
    # (zeroed router -> argmax ties break to index 0): token 2 must be KEPT
    # (pos 2 < 3) and token 3 dropped (pos 3 >= 3).
    cfg = tiny_cfg(moe_num_experts=2, moe_capacity_factor=0.45,
                   hidden_dropout_prob=0.0)
    mod = MoeMlp(cfg)
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (1, 10, cfg.hidden_size))
    p = mod.init({'params': rng}, x, deterministic=True)['params']
    p = dict(p, router={'kernel': jnp.zeros_like(p['router']['kernel'])})
    y = np.asarray(mod.apply({'params': p}, x, deterministic=True))[0]
    assert np.linalg.norm(y[2]) > 1e-4, \
        'token 2 dropped: capacity was truncated below ceil(cf*S/E)'
    np.testing.assert_allclose(y[3], 0.0, atol=1e-6)


def test_moe_vit_grad_and_aux_loss():
    cfg = tiny_cfg()
    m = EcgVit(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 3, 320))
    y = jnp.zeros((4, cfg.num_class)).at[:, 0].set(1.0)
    variables = m.init({'params': rng}, x)
    # init also creates the sown 'moe' collection; trainers strip it
    assert set(variables) == {'params', 'moe'}
    params = {'params': variables['params']}
    # only every moe_every-th block carries experts
    assert 'moe' in variables['params']['encoder']['block_1']
    assert 'mlp' in variables['params']['encoder']['block_0']

    out, aux = apply_with_moe(m, params, x, labels=y, deterministic=False,
                              rngs={'dropout': rng}, moe=True)
    # Switch LB loss is ~1 near a uniform router, and always >= 1/E * E = 1
    # only at exact uniformity; just assert sane range
    assert 0.9 < float(aux) < float(cfg.moe_num_experts)
    assert np.isfinite(float(out.loss))

    def lf(p):
        o, a = apply_with_moe(m, p, x, labels=y, deterministic=False,
                              rngs={'dropout': rng}, moe=True)
        return o.loss + cfg.moe_aux_weight * a

    g = jax.jit(jax.grad(lf))(params)
    gn = optax.global_norm(g)
    assert bool(jnp.isfinite(gn)) and float(gn) > 0
    # router receives gradient (through gate and the aux loss)
    rg = g['params']['encoder']['block_1']['moe']['router']['kernel']
    assert float(jnp.abs(rg).max()) > 0
    # eval path: plain apply (no mutable) must not error -- sow no-ops
    out2 = m.apply(params, x, labels=y, deterministic=True)
    assert np.isfinite(float(out2.loss))


def test_apply_with_moe_dense_passthrough():
    cfg = tiny_cfg(moe_num_experts=0)
    m = EcgVit(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3, 320))
    params = m.init({'params': rng}, x)
    out, aux = apply_with_moe(m, params, x, deterministic=True, moe=False)
    assert float(aux) == 0.0
    np.testing.assert_array_equal(
        np.asarray(out.logits),
        np.asarray(m.apply(params, x, deterministic=True).logits))


def test_moe_reaches_pretrain_trunks(tmp_path):
    # MAE and contrastive trunks build MoE blocks under the same placement
    # rule -- a Switch trunk must pretrain with its experts live, and the
    # trainers' aux loss must be nonzero
    from ecg_representation_learning_tpu.configs import MaeConfig
    from ecg_representation_learning_tpu.models.mae import EcgMae
    cfg = tiny_cfg()
    m = EcgMae(cfg, MaeConfig(decoder_num_layers=1, decoder_hidden_size=32,
                              decoder_num_heads=2,
                              decoder_intermediate_size=64))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3, 320))
    variables = m.init({'params': rng, 'mask': rng}, x)
    assert 'moe' in variables['params']['encoder_block_1']
    assert 'mlp' in variables['params']['encoder_block_0']
    out, mut = m.apply({'params': variables['params']}, x, deterministic=True,
                       rngs={'mask': rng}, mutable=['moe'])
    from ecg_representation_learning_tpu.models.moe import moe_aux_loss
    assert float(moe_aux_loss(mut)) > 0.5

    from ecg_representation_learning_tpu.models.contrastive import (
        EcgContrastive)
    from ecg_representation_learning_tpu.configs import ContrastiveConfig
    cm = EcgContrastive(cfg, ContrastiveConfig(proj_hidden_size=16, proj_dim=8))
    cv = cm.init({'params': rng}, x)
    assert 'moe' in cv['params']['encoder']['block_1']


def test_moe_trainer_expert_parallel_mesh(tmp_path):
    # end-to-end: EcgVit with Switch MoE blocks trains on a 4x2 DP x EP mesh;
    # expert stacks are physically sharded E/2-per-chip over 'model'
    mesh = make_mesh(n_data=4, n_model=2)
    signals, labels, folds = synth_ptbxl(n=96, length=640)
    splits = get_ptbxl_splits(signals, labels, folds)
    model_cfg = VitConfig.from_defined(
        'debug', max_signal_length=704, use_flash_attention=False,
        moe_num_experts=4, moe_every=2)
    cfg = TrainConfig(num_train_epoch=1, train_batch_size=16,
                      eval_batch_size=16, mesh_model=2)
    tr = Trainer(model_cfg, cfg, train_data=splits.train,
                 eval_data=splits.eval, mesh=mesh,
                 output_dir=str(tmp_path / 'moe'))
    tr.init_state()
    sh = param_shardings(tr.state.params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    specs = {'/'.join(getattr(k, 'key', str(k)) for k in kp): v.spec
             for kp, v in flat}
    w = [v for k, v in specs.items() if k.endswith('moe/w1') or k.endswith('moe/w2')]
    assert w and all(tuple(s) == ('model', None, None) for s in w)
    # physical placement: each chip holds E / n_model experts
    w1 = tr.state.params['params']['encoder']['block_1']['moe']['w1']
    shard_shapes = {tuple(s.data.shape) for s in w1.addressable_shards}
    assert shard_shapes == {(2, w1.shape[1], w1.shape[2])}
    res = tr.train()
    assert np.isfinite(res['history'][-1]['loss'])
