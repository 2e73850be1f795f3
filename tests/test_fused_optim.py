"""FusedAdamW (train/optim.py) numerical parity with the optax chain it
replaces: chain(clip_by_global_norm, adamw/adam) + apply_updates, plus the
trainer's zero-nonfinite-gradients sanitizer semantics.

Reference training semantics: AdamW + global-norm clip 1.0
(models/train.py:242-252, 281).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ecg_representation_learning_tpu.train.optim import (FusedAdamW,
                                                         apply_optimizer)


def tree_allclose(a, b, rtol=2e-5, atol=1e-7):
    flat_a, flat_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64),
                                   rtol=rtol, atol=atol)


def make_tree(rng, scale=1.0):
    return {
        'dense': {'kernel': jnp.asarray(rng.standard_normal((16, 8)) * scale,
                                        jnp.float32),
                  'bias': jnp.asarray(rng.standard_normal(8) * scale,
                                      jnp.float32)},
        'norm': {'scale': jnp.asarray(rng.standard_normal(16) * scale,
                                      jnp.float32)},
    }


SCHED = optax.warmup_cosine_decay_schedule(0.0, 3e-4, 5, 50, 0.0)


@pytest.mark.parametrize('wd,big_grads', [(1e-2, False), (0.0, True),
                                          (1e-2, True)])
def test_multi_step_parity_vs_optax_chain(wd, big_grads):
    """Several steps, with and without clipping actually triggering."""
    rng = np.random.default_rng(0)
    params = make_tree(rng)
    gscale = 10.0 if big_grads else 0.05  # big -> ||g|| > 1 engages the clip

    fused = FusedAdamW(SCHED, weight_decay=wd, clip_norm=1.0)
    if wd:
        ref_inner = optax.adamw(SCHED, weight_decay=wd)
    else:
        ref_inner = optax.adam(SCHED)
    ref = optax.chain(optax.clip_by_global_norm(1.0), ref_inner)

    fp, fs = dict(params), fused.init(params)
    rp, rs = dict(params), ref.init(params)
    for step in range(5):
        grads = make_tree(rng, scale=gscale)
        fp, fs = fused.apply(grads, fs, fp)
        u, rs = ref.update(grads, rs, rp)
        rp = optax.apply_updates(rp, u)
        tree_allclose(fp, rp)
    # moments match the optax scale_by_adam state too
    adam_state = rs[1][0] if wd else rs[1][0]
    tree_allclose(fs.mu, adam_state.mu)
    tree_allclose(fs.nu, adam_state.nu)
    assert int(fs.count) == 5


def test_nonfinite_zeroing_matches_sanitizer_plus_chain():
    """scale=0 on a NaN step == the trainer's zero-grads-then-optax-update."""
    rng = np.random.default_rng(1)
    params = make_tree(rng)
    fused = FusedAdamW(3e-4, weight_decay=1e-2, clip_norm=1.0,
                       zero_nonfinite=True)
    ref = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(3e-4, weight_decay=1e-2))

    fp, fs = dict(params), fused.init(params)
    rp, rs = dict(params), ref.init(params)
    for step in range(3):
        grads = make_tree(rng)
        if step == 1:  # poison one step
            grads['dense']['kernel'] = grads['dense']['kernel'].at[0, 0].set(
                jnp.nan)
            zeroed = jax.tree.map(jnp.zeros_like, grads)
        else:
            zeroed = grads
        fp, fs = fused.apply(grads, fs, fp)
        u, rs = ref.update(zeroed, rs, rp)
        rp = optax.apply_updates(rp, u)
        tree_allclose(fp, rp)
    assert np.all(np.isfinite(np.asarray(fp['dense']['kernel'])))


def test_mu_dtype_storage():
    rng = np.random.default_rng(2)
    params = make_tree(rng)
    fused = FusedAdamW(3e-4, clip_norm=1.0, mu_dtype=jnp.bfloat16)
    state = fused.init(params)
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(state.mu))
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(state.nu))
    p2, s2 = fused.apply(make_tree(rng), state, params)
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(s2.mu))
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(p2))


def test_apply_optimizer_dispatch():
    rng = np.random.default_rng(3)
    params = make_tree(rng)
    grads = make_tree(rng)
    fused = FusedAdamW(3e-4, weight_decay=1e-2, clip_norm=1.0)
    p1, _ = apply_optimizer(fused, grads, fused.init(params), params)
    ref = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(3e-4, weight_decay=1e-2))
    p2, _ = apply_optimizer(ref, grads, ref.init(params), params)
    tree_allclose(p1, p2)


def test_pallas_update_kernel_matches_jnp_leaf():
    """ops/adamw_pallas.py (interpret mode) == the FusedAdamW jnp leaf,
    including the clip scale, finite flag, and a non-lane-multiple fallback."""
    from ecg_representation_learning_tpu.ops.adamw_pallas import (
        adamw_update_leaf, leaf_eligible)

    rng = np.random.default_rng(5)
    b1, b2, eps, wd = 0.9, 0.999, 1e-8, 1e-2
    for shape in [(768,), (256, 128), (41, 768)]:
        g = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        mu = jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.float32)
        nu = jnp.asarray(rng.uniform(0.001, 0.1, shape), jnp.float32)
        p = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        assert leaf_eligible(g, mu, nu, p)
        for scale, lr, bc1, bc2, finite in [(0.73, 3e-4, 0.1, 0.001, 1.0),
                                            (1.0, 1e-3, 0.5, 0.2, 0.0)]:
            scalars = jnp.asarray([[scale, lr, bc1, bc2, finite]], jnp.float32)
            mu2, nu2, p2 = adamw_update_leaf(g, mu, nu, p, scalars,
                                             b1=b1, b2=b2, eps=eps, wd=wd,
                                             interpret=True)
            g32 = jnp.where(finite > 0, g * scale, 0.0)
            mu_ref = b1 * mu + (1 - b1) * g32
            nu_ref = b2 * nu + (1 - b2) * jnp.square(g32)
            upd = (mu_ref / bc1) / (jnp.sqrt(nu_ref / bc2) + eps) + wd * p
            p_ref = p - lr * upd
            np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu_ref),
                                       rtol=1e-5, atol=1e-7)
            np.testing.assert_allclose(np.asarray(nu2), np.asarray(nu_ref),
                                       rtol=1e-5, atol=1e-7)
            np.testing.assert_allclose(np.asarray(p2), np.asarray(p_ref),
                                       rtol=1e-5, atol=1e-7)
    # ineligible: 71-wide head bias falls back to the jnp path
    bad = jnp.zeros((71,), jnp.float32)
    assert not leaf_eligible(bad, bad, bad, bad)


@pytest.mark.slow  # >13 s measured (round-4 tiering)
def test_chain_checkpoint_migrates_into_fused_trainer(tmp_path):
    """A checkpoint saved under the pre-FusedAdamW optax-chain layout resumes
    into a fused trainer with its Adam moments and count INTACT (not the
    params-only fallback) -- exact resume survives the optimizer upgrade."""
    from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
    from ecg_representation_learning_tpu.train.optim import adam_moments
    from ecg_representation_learning_tpu.train.trainer import (SplitData,
                                                               Trainer)

    rng = np.random.default_rng(6)
    data = SplitData(
        signals=rng.standard_normal((32, 12, 250)).astype(np.float32),
        labels=(rng.uniform(size=(32, 8)) > 0.7).astype(np.float32))
    model_cfg = VitConfig.from_defined('debug', max_signal_length=320,
                                       num_class=8)
    old = Trainer(model_cfg,
                  TrainConfig(num_train_epoch=1, train_batch_size=8,
                              do_eval=False, fused_optimizer=False,
                              log_to_console=False),
                  train_data=data, output_dir=str(tmp_path / 'old'))
    old.train()
    mu_old, nu_old = adam_moments(old.state.opt_state)

    new = Trainer(model_cfg,
                  TrainConfig(num_train_epoch=1, train_batch_size=8,
                              do_eval=False, fused_optimizer=True,
                              log_to_console=False),
                  train_data=data, output_dir=str(tmp_path / 'new'))
    new.init_state()
    new.load_checkpoint(str(tmp_path / 'old' / 'ckpt-final'))
    mu_new, nu_new = adam_moments(new.state.opt_state)
    tree_allclose(mu_new, mu_old, rtol=1e-6)
    tree_allclose(nu_new, nu_old, rtol=1e-6)
    assert int(new.state.opt_state.count) == int(
        old.state.opt_state[1][0].count)
    assert int(new.state.step) == int(old.state.step)
    # moments actually carry signal (not the zero-init fallback)
    assert any(float(np.abs(np.asarray(l)).max()) > 0
               for l in jax.tree.leaves(mu_new))


@pytest.mark.slow  # >13 s measured (round-4 tiering)
def test_trainer_fused_vs_chain_loss_parity():
    """Same data, same seeds: the fused and optax-chain trainers produce
    matching losses over an epoch (the end-to-end guarantee)."""
    from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
    from ecg_representation_learning_tpu.train.trainer import (SplitData,
                                                               Trainer)

    rng = np.random.default_rng(4)
    n = 32
    data = SplitData(
        signals=rng.standard_normal((n, 12, 250)).astype(np.float32),
        labels=(rng.uniform(size=(n, 8)) > 0.7).astype(np.float32))
    model_cfg = VitConfig.from_defined('debug', max_signal_length=320,
                                       num_class=8)
    losses = {}
    for fused in (True, False):
        cfg = TrainConfig(num_train_epoch=2, train_batch_size=8,
                          eval_batch_size=8, do_eval=True,
                          fused_optimizer=fused, log_to_console=False)
        tr = Trainer(model_cfg, cfg, train_data=data, eval_data=data,
                     output_dir=f'/tmp/test-fused-{fused}')
        res = tr.train()
        losses[fused] = res['history'][-1]['loss']
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)


@pytest.mark.slow  # >13 s measured (round-4 tiering)
def test_chain_checkpoint_does_not_migrate_across_mu_dtype(tmp_path):
    """f32 chain moments must NOT migrate into a fused trainer configured
    with adam_mu_dtype='bfloat16': installing f32 mu there would silently
    double the moment HBM footprint and recompile the donated step.  The
    params-only fallback (fresh opt state in the CONFIGURED dtype) is the
    correct behavior."""
    from ecg_representation_learning_tpu.configs import TrainConfig, VitConfig
    from ecg_representation_learning_tpu.train.optim import adam_moments
    from ecg_representation_learning_tpu.train.trainer import (SplitData,
                                                               Trainer)

    rng = np.random.default_rng(7)
    data = SplitData(
        signals=rng.standard_normal((16, 12, 250)).astype(np.float32),
        labels=(rng.uniform(size=(16, 8)) > 0.7).astype(np.float32))
    model_cfg = VitConfig.from_defined('debug', max_signal_length=320,
                                       num_class=8)
    old = Trainer(model_cfg,
                  TrainConfig(num_train_epoch=1, train_batch_size=8,
                              do_eval=False, fused_optimizer=False,
                              log_to_console=False),
                  train_data=data, output_dir=str(tmp_path / 'old'))
    old.train()

    new = Trainer(model_cfg,
                  TrainConfig(num_train_epoch=1, train_batch_size=8,
                              do_eval=False, fused_optimizer=True,
                              adam_mu_dtype='bfloat16',
                              log_to_console=False),
                  train_data=data, output_dir=str(tmp_path / 'new'))
    new.init_state()
    new.load_checkpoint(str(tmp_path / 'old' / 'ckpt-final'))
    mu_new, _ = adam_moments(new.state.opt_state)
    # mu stays in the configured dtype and at its fresh zero init
    for leaf in jax.tree.leaves(mu_new):
        assert np.asarray(leaf).dtype.name == 'bfloat16'
        assert float(np.abs(np.asarray(leaf, np.float32)).max()) == 0.0
    # params still restored exactly
    for a, b in zip(jax.tree.leaves(new.state.params),
                    jax.tree.leaves(old.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
