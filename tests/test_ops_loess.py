"""Tests for the robust LOESS baseline remover.

No committed golden from the reference exists (its own parity vs MATLAB is
only atol=10, data_preprocessor.py:196); instead we verify the defining
mathematical properties of local quadratic regression plus robustness.
"""
import numpy as np
import jax.numpy as jnp

from ecg_representation_learning_tpu.ops import remove_baseline, rloess


def test_quadratic_reproduction(rng):
    # degree-2 local regression reproduces any global quadratic exactly,
    # at interior AND edge points, regardless of weights
    L = 800
    t = np.linspace(-1, 1, L)
    y = 3.0 + 2.0 * t - 5.0 * t ** 2
    got = np.asarray(rloess(jnp.asarray(y[None]), n=301, robust_iters=1))[0]
    np.testing.assert_allclose(got, y, atol=5e-3)


def test_smooths_noise(rng):
    L = 2000
    t = np.arange(L) / 500.0
    base = 100 * np.sin(2 * np.pi * 0.25 * t)
    noise = 5.0 * rng.standard_normal(L)
    got = np.asarray(rloess(jnp.asarray((base + noise)[None]), n=501))[0]
    # recovers the slow baseline despite noise (interior)
    err = np.abs(got[300:-300] - base[300:-300])
    assert err.max() < 5.0


def test_robust_to_spikes(rng):
    # QRS-like spikes should NOT drag the robust baseline estimate
    L = 2000
    t = np.arange(L) / 500.0
    base = 50 * np.sin(2 * np.pi * 0.2 * t)
    y = base.copy()
    spike_pos = np.arange(100, L, 400)
    y[spike_pos] += 1000.0  # huge outliers
    smooth_robust = np.asarray(rloess(jnp.asarray(y[None]), n=501, robust_iters=5))[0]
    smooth_plain = np.asarray(rloess(jnp.asarray(y[None]), n=501, robust_iters=0))[0]
    err_robust = np.abs(smooth_robust[300:-300] - base[300:-300]).max()
    err_plain = np.abs(smooth_plain[300:-300] - base[300:-300]).max()
    assert err_robust < err_plain * 0.5
    assert err_robust < 10.0


def test_remove_baseline_preserves_qrs(rng):
    # Zheng step 2: subtracting the LOESS smooth removes wander, keeps QRS
    L, fs = 2500, 500
    t = np.arange(L) / fs
    wander = 200 * np.sin(2 * np.pi * 0.3 * t)
    qrs = np.zeros(L)
    phase = (t * 1.2) % 1.0
    qrs += 800 * np.exp(-((phase - 0.5) ** 2) / (2 * 0.0004))
    y = wander + qrs
    out = np.asarray(remove_baseline(jnp.asarray(y[None]), fqs=fs))[0]
    # wander mostly gone in interior
    inner = slice(400, -400)
    assert np.abs(out[inner][qrs[inner] < 1]).max() < 60.0
    # QRS peaks preserved within ~15%
    peak_idx = np.nonzero(qrs > 700)[0]
    peak_idx = peak_idx[(peak_idx > 400) & (peak_idx < L - 400)]
    assert np.abs(out[peak_idx] - qrs[peak_idx]).max() < 0.15 * 800


def test_batched_and_window_forced_odd(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 600)))
    y = rloess(x, n=100)  # even window gets forced odd
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_window_larger_than_signal(rng):
    x = jnp.asarray(rng.standard_normal((1, 64)))
    y = rloess(x, n=500)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_median_last_axis_matches_numpy(rng):
    from ecg_representation_learning_tpu.ops.loess import median_last_axis
    for shape in [(7, 101), (3, 4, 250), (5, 2500), (2, 1)]:
        r = rng.standard_normal(shape).astype(np.float32) * 50
        got = np.asarray(median_last_axis(jnp.asarray(r)))
        want = np.median(r, axis=-1).astype(np.float32)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # ties / constant rows
    r = np.ones((4, 64), np.float32) * 3.5
    np.testing.assert_array_equal(
        np.asarray(median_last_axis(jnp.asarray(r))), np.full(4, 3.5, np.float32))
