"""GPipe-style pipeline parallelism over the 'stage' mesh axis."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecg_representation_learning_tpu.configs import VitConfig
from ecg_representation_learning_tpu.models.vit import Block
from ecg_representation_learning_tpu.parallel.pipeline_parallel import (
    pipeline_apply, place_stage_params, stack_stage_params,
)
from jax.sharding import Mesh


CFG = VitConfig.from_defined('debug', max_signal_length=256, patch_size=32,
                             use_flash_attention=False,
                             hidden_dropout_prob=0.0,
                             attention_probs_dropout_prob=0.0)
L, B, T, H = CFG.num_hidden_layers, 2, 8, CFG.hidden_size


def _stage_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ('stage',))


def _stacked_block_params(seed=0):
    blk = Block(CFG)
    dummy = jnp.zeros((B, T, H), jnp.float32)
    per = [blk.init({'params': k}, dummy, True)['params']
           for k in jax.random.split(jax.random.PRNGKey(seed), L)]
    return jax.tree.map(lambda *a: jnp.stack(a), *per)


def _block_fn(lp, h):
    return Block(CFG).apply({'params': lp}, h, True)[0]


def _sequential(stacked, x_micro):
    def run_one(h):
        for i in range(L):
            h = _block_fn(jax.tree.map(lambda a, i=i: a[i], stacked), h)
        return h
    return jax.vmap(run_one)(x_micro)


def test_pipeline_matches_sequential(rng):
    mesh = _stage_mesh(4)
    stacked = _stacked_block_params()
    stage_params = place_stage_params(stack_stage_params(stacked, 4), mesh)
    x = jnp.asarray(rng.standard_normal((4, B, T, H)), jnp.float32)  # M=4
    want = np.asarray(_sequential(stacked, x))
    got = np.asarray(jax.jit(lambda p, a: pipeline_apply(
        p, a, _block_fn, mesh))(stage_params, x))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pipeline_grads_match_sequential(rng):
    mesh = _stage_mesh(4)
    stacked = _stacked_block_params(seed=1)
    x = jnp.asarray(rng.standard_normal((4, B, T, H)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    def loss_pipe(st):
        sp = stack_stage_params(st, 4)
        return (pipeline_apply(sp, x, _block_fn, mesh) * w).sum()

    def loss_seq(st):
        return (_sequential(st, x) * w).sum()

    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    leaves_p, leaves_s = jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)
    assert leaves_p and any(np.abs(np.asarray(g)).max() > 0 for g in leaves_p)
    for gp, gs in zip(leaves_p, leaves_s):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   atol=2e-4, rtol=1e-3)


def test_pipeline_microbatches_not_multiple_of_stages(rng):
    # M=6 microbatches over 4 stages: schedule handles M != S
    mesh = _stage_mesh(4)
    stacked = _stacked_block_params(seed=2)
    stage_params = place_stage_params(stack_stage_params(stacked, 4), mesh)
    x = jnp.asarray(rng.standard_normal((6, B, T, H)), jnp.float32)
    want = np.asarray(_sequential(stacked, x))
    got = np.asarray(pipeline_apply(stage_params, x, _block_fn, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pipeline_training_step_reduces_loss(rng):
    # one SGD step through the pipelined stack reduces a regression loss;
    # param grads come back stage-sharded
    import optax
    mesh = _stage_mesh(4)
    stacked = _stacked_block_params(seed=3)
    x = jnp.asarray(rng.standard_normal((4, B, T, H)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((4, B, T, H)), jnp.float32) * 0.1

    def loss_fn(st):
        sp = stack_stage_params(st, 4)
        out = pipeline_apply(sp, x, _block_fn, mesh)
        return ((out - y) ** 2).mean()

    l0, g = jax.jit(jax.value_and_grad(loss_fn))(stacked)
    p2 = jax.tree.map(lambda p, gg: p - 0.02 * gg, stacked, g)
    l1 = float(jax.jit(loss_fn)(p2))
    assert np.isfinite(float(l0)) and l1 < float(l0)


def test_dropout_keys_decorrelated_across_data_shards(rng):
    # DP x PP mesh: the dropout key enters shard_map replicated, so without a
    # data-axis fold every data shard would mask its own (different) samples
    # with IDENTICAL patterns.  Feed identical rows into both data shards and
    # assert the applied masks differ.
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ('data', 'stage'))
    stage_params = place_stage_params(
        jax.tree.map(lambda a: a, {'w': jnp.ones((4, 1, 1), jnp.float32)}),
        mesh)

    def block_fn(lp, h, key):
        keep = jax.random.bernoulli(key, 0.5, h.shape)
        return jnp.where(keep, h, jnp.zeros_like(h)) * lp['w'][0]

    # (M=4, B=2, T, H) with both batch rows identical; B sharded over 'data'
    row = jnp.asarray(rng.standard_normal((4, 1, 8, 16)), jnp.float32)
    x = jnp.concatenate([row, row], axis=1)
    from jax.sharding import PartitionSpec as P
    out = np.asarray(pipeline_apply(stage_params, x, block_fn, mesh,
                                    x_spec=P(None, 'data'),
                                    rng=jax.random.PRNGKey(7)))
    # same inputs, different shards -> different dropout masks
    assert not np.allclose(out[:, 0], out[:, 1])
    # and dropout actually acted (some entries zeroed)
    assert (out == 0).any()
