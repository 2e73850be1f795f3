"""Tests for normalization, padding, and augmentation transforms
(reference preprocess/transform.py + EcgPadder semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from ecg_representation_learning_tpu.ops import (
    apply_norms, fit_dynamic_norm, normalize_fixed, pad_to_multiple, time_end_pad, timeout,
)
from ecg_representation_learning_tpu.registry import PTBXL_TRAIN_STATS


def test_normalize_fixed_stats(rng):
    x = rng.standard_normal((4, 12, 100)).astype(np.float32)
    stats = PTBXL_TRAIN_STATS['original']
    got = np.asarray(normalize_fixed(jnp.asarray(x), stats['mean'], stats['std']))
    mean = np.asarray(stats['mean']).reshape((1, 12, 1))
    std = np.asarray(stats['std']).reshape((1, 12, 1))
    np.testing.assert_allclose(got, (x - mean) / std, rtol=1e-5)


def test_dynamic_norm_std_scheme(rng):
    arr = rng.standard_normal((8, 12, 50)) * 3 + 2
    norms = fit_dynamic_norm(arr, ('std', 1))
    out = np.asarray(apply_norms(jnp.asarray(arr, dtype=jnp.float32), norms))
    # per-lead mean ~0, std ~1 after normalization
    np.testing.assert_allclose(out.mean(axis=(0, 2)), 0, atol=1e-2)
    np.testing.assert_allclose(out.std(axis=(0, 2)), 1, atol=1e-2)


def test_dynamic_norm_global_scheme(rng):
    arr = rng.standard_normal((4, 2, 30))
    norms = fit_dynamic_norm(arr, 'global')
    out = np.asarray(apply_norms(jnp.asarray(arr, dtype=jnp.float32), norms))
    assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6


def test_dynamic_norm_chain(rng):
    # the reference default chain (('norm', 3), ('std', 1)) -- transform.py:113
    arr = rng.standard_normal((6, 3, 40))
    norms = fit_dynamic_norm(arr, [('norm', 3), ('std', 1)])
    assert len(norms) == 2
    out = np.asarray(apply_norms(jnp.asarray(arr, dtype=jnp.float32), norms))
    assert np.isfinite(out).all()


def test_time_end_pad_quirk():
    # reference TimeEndPad pads a full k when already aligned (transform.py:150)
    x = jnp.ones((12, 2500))
    assert time_end_pad(x, 64).shape == (12, 2560)
    assert time_end_pad(jnp.ones((12, 2560)), 64).shape == (12, 2624)


def test_pad_to_multiple_zero():
    x = jnp.ones((2, 12, 2500))
    y = pad_to_multiple(x, 8, 'zero')
    assert y.shape == (2, 12, 2504)
    assert float(jnp.abs(y[..., 2500:]).max()) == 0.0


def test_pad_to_multiple_shift():
    x = jnp.asarray(np.arange(10, dtype=np.float32)[None])
    y = pad_to_multiple(x, 8, 'shift')  # 10 -> 16, pad 6
    assert y.shape == (1, 16)
    # reference shift: a[-end:] = a[-2*end:-end] -> last 6 real samples repeated
    np.testing.assert_array_equal(np.asarray(y[0, 10:]), np.arange(4, 10, dtype=np.float32))


def test_timeout_masks_contiguous_span(rng):
    x = jnp.ones((4, 12, 200))
    key = jax.random.PRNGKey(0)
    y = np.asarray(timeout(key, x, lo=0.2, hi=0.5))
    for i in range(4):
        zero_cols = np.nonzero((y[i] == 0).all(axis=0))[0]
        frac = zero_cols.size / 200
        assert 0.2 - 0.01 <= frac <= 0.5 + 0.01, frac
        # contiguous
        assert (np.diff(zero_cols) == 1).all()
        # span shared across leads
        assert ((y[i] == 0).all(axis=0) | (y[i] == 1).all(axis=0)).all()


def test_timeout_zero_possible():
    # lo=0 must be legal (reference default scale=(0, 0.5))
    x = jnp.ones((2, 3, 50))
    y = timeout(jax.random.PRNGKey(1), x, lo=0.0, hi=0.5)
    assert np.isfinite(np.asarray(y)).all()
