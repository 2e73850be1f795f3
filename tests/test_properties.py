"""Property-based tests (hypothesis) over the core DSP/transform ops.

The suite's golden tests pin exact values against scipy/numpy on fixed
fixtures; these properties sweep shapes, dtypes-of-content, and edge classes
(constant rows, tiny lengths, extreme magnitudes) that fixtures miss.
"""
import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from ecg_representation_learning_tpu.ops.loess import median_last_axis
from ecg_representation_learning_tpu.ops.normalize import normalize_fixed
from ecg_representation_learning_tpu.ops.pad import pad_to_multiple, time_end_pad
from ecg_representation_learning_tpu.ops.resample import resample_poly


SETTINGS = dict(max_examples=25, deadline=None)


@given(rows=st.integers(1, 6), length=st.integers(1, 400),
       scale=st.sampled_from([1e-3, 1.0, 1e4]), seed=st.integers(0, 2**31 - 1))
@settings(**SETTINGS)
def test_median_matches_numpy_everywhere(rows, length, scale, seed):
    r = (np.random.default_rng(seed).standard_normal((rows, length))
         * scale).astype(np.float32)
    got = np.asarray(median_last_axis(jnp.asarray(r)))
    want = np.median(r, axis=-1).astype(np.float32)
    # converges to within a few ulps of the DATA scale; visible only when the
    # two middle values of an even-length row nearly cancel
    atol = 4 * float(np.spacing(np.float32(np.abs(r).max() or 1.0)))
    np.testing.assert_allclose(got, want, rtol=0, atol=atol)


@given(length=st.integers(1, 300), k=st.integers(1, 80),
       seed=st.integers(0, 2**31 - 1))
@settings(**SETTINGS)
def test_pad_always_pads_to_next_multiple(length, k, seed):
    x = np.random.default_rng(seed).standard_normal((2, 3, length)).astype(np.float32)
    for fn in (lambda a: time_end_pad(a, k), lambda a: pad_to_multiple(a, k)):
        y = np.asarray(fn(jnp.asarray(x)))
        assert y.shape[-1] % k == 0
        assert y.shape[-1] > length          # the reference's always-pad quirk
        assert y.shape[-1] - length <= k
        np.testing.assert_array_equal(y[..., :length], x)  # prefix untouched
        np.testing.assert_array_equal(y[..., length:], 0.0)


@given(length=st.integers(8, 300), k=st.integers(1, 40),
       seed=st.integers(0, 2**31 - 1))
@settings(**SETTINGS)
def test_shift_pad_repeats_tail(length, k, seed):
    x = np.random.default_rng(seed).standard_normal((2, length)).astype(np.float32)
    y = np.asarray(pad_to_multiple(jnp.asarray(x), k, mode='shift'))
    n_pad = y.shape[-1] - length
    assert 1 <= n_pad <= k
    if n_pad <= length:
        # reference semantics ecg_tokenizer.py:121: a[-end:] = a[-2*end:-end]
        # applied to the padded array -- the tail repeats earlier samples
        np.testing.assert_array_equal(y[..., -n_pad:], y[..., -2 * n_pad:-n_pad])


@given(ch=st.integers(1, 12), length=st.integers(1, 200),
       seed=st.integers(0, 2**31 - 1))
@settings(**SETTINGS)
def test_normalize_fixed_inverts(ch, length, seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((3, ch, length)).astype(np.float32) * 5
    mean = rng.standard_normal(ch).astype(np.float32)
    std = (0.5 + rng.uniform(size=ch)).astype(np.float32)
    y = np.asarray(normalize_fixed(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(std)))
    back = y * std[None, :, None] + mean[None, :, None]
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)
    # constant channels stay finite under z-norm
    const = np.ones((1, ch, max(length, 1)), np.float32)
    yc = np.asarray(normalize_fixed(jnp.asarray(const), jnp.asarray(mean), jnp.asarray(std)))
    assert np.isfinite(yc).all()


@given(n_in=st.integers(64, 600), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=10, deadline=None)
def test_resample_poly_halves_length_and_preserves_dc(n_in, seed):
    x = np.random.default_rng(seed).standard_normal((2, n_in)).astype(np.float32)
    y = np.asarray(resample_poly(jnp.asarray(x), 1, 2))
    assert y.shape == (2, -(-n_in // 2))     # ceil(n/2), scipy convention
    # a constant signal resamples to the same constant up to the Kaiser
    # FIR's passband ripple (~0.9% -- identical in scipy.signal.resample_poly)
    c = np.full((1, n_in), 3.25, np.float32)
    yc = np.asarray(resample_poly(jnp.asarray(c), 1, 2))
    interior = yc[:, 5:-5]
    if interior.size:
        np.testing.assert_allclose(interior, 3.25, rtol=2e-2)
