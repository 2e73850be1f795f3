"""Fusion-friendly counter-hash dropout (ops/dropout.py).

Semantics under test: keep-fraction/scaling statistics, site decorrelation
via salts, rng determinism, deterministic-path parity with the flax
implementation, and gradient flow through the scanned/remat block layouts.
Reference dropout sites: vit_pytorch.ViT via models/ecg_vit.py:95-127.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecg_representation_learning_tpu.configs import VitConfig
from ecg_representation_learning_tpu.models.vit import EcgVit
from ecg_representation_learning_tpu.ops.dropout import hash_dropout


def test_keep_fraction_and_scaling():
    x = jnp.ones((512, 768), jnp.float32)
    rng = jax.random.PRNGKey(0)
    for rate in (0.1, 0.5):
        y = hash_dropout(x, rate, rng, salt=3)
        keep = float((y > 0).mean())
        assert abs(keep - (1 - rate)) < 0.02, (rate, keep)
        # inverted-scale preserves the mean (E[y] = E[x])
        assert abs(float(y.mean()) - 1.0) < 0.03
        # kept elements carry exactly 1/(1-rate)
        kept = np.asarray(y)[np.asarray(y) > 0]
        np.testing.assert_allclose(kept, 1.0 / (1 - rate), rtol=1e-6)


def test_rate_zero_identity():
    x = jax.random.normal(jax.random.PRNGKey(1), (33, 7))
    y = hash_dropout(x, 0.0, jax.random.PRNGKey(0), salt=1)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_salts_decorrelate_sites():
    x = jnp.ones((512, 768), jnp.float32)
    rng = jax.random.PRNGKey(0)
    m1 = np.asarray(hash_dropout(x, 0.1, rng, salt=3)) > 0
    m2 = np.asarray(hash_dropout(x, 0.1, rng, salt=4)) > 0
    agree = (m1 == m2).mean()
    # independent masks agree with prob .9^2 + .1^2 = .82
    assert 0.78 < agree < 0.86, agree


def test_deterministic_in_rng_and_varies_across_rngs():
    x = jnp.ones((64, 64), jnp.float32)
    a = hash_dropout(x, 0.2, jax.random.PRNGKey(5), salt=1)
    b = hash_dropout(x, 0.2, jax.random.PRNGKey(5), salt=1)
    c = hash_dropout(x, 0.2, jax.random.PRNGKey(6), salt=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


@pytest.fixture(scope='module')
def debug_model():
    cfg = VitConfig.from_defined('debug', max_signal_length=512,
                                 dropout_impl='hash')
    model = EcgVit(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.num_channels, 512))
    params = model.init({'params': jax.random.PRNGKey(2)}, x)
    return cfg, model, x, params


def test_eval_path_matches_flax_impl(debug_model):
    cfg, model, x, params = debug_model
    flax_model = EcgVit(VitConfig.from_defined('debug', max_signal_length=512,
                                               dropout_impl='flax'))
    got = model.apply(params, x, deterministic=True).logits
    want = flax_model.apply(params, x, deterministic=True).logits
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_model_dropout_deterministic_per_rng(debug_model):
    cfg, model, x, params = debug_model
    kw = dict(deterministic=False)
    a = model.apply(params, x, rngs={'dropout': jax.random.PRNGKey(3)}, **kw).logits
    b = model.apply(params, x, rngs={'dropout': jax.random.PRNGKey(3)}, **kw).logits
    c = model.apply(params, x, rngs={'dropout': jax.random.PRNGKey(4)}, **kw).logits
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.slow  # >13 s measured (round-4 tiering)
def test_grad_flows_scan_blocks():
    cfg = VitConfig.from_defined('debug', max_signal_length=512,
                                 scan_blocks=True, dropout_impl='hash')
    model = EcgVit(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.num_channels, 512))
    params = model.init({'params': jax.random.PRNGKey(2)}, x)
    labels = jnp.zeros((2, cfg.num_class)).at[:, 0].set(1.0)

    def loss_fn(p, rng):
        return model.apply(p, x, labels=labels, deterministic=False,
                           rngs={'dropout': rng}).loss

    g = jax.grad(loss_fn)(params, jax.random.PRNGKey(3))
    total = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()), g, 0.0)
    assert np.isfinite(total) and total > 0
