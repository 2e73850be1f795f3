"""Golden tests: Butterworth zero-phase filtering vs scipy.

Replaces the reference's MATLAB-CSV parity rig (data_preprocessor.py:182-209)
with scipy as the committed golden source.
"""
import numpy as np
import jax.numpy as jnp
from scipy import signal

from ecg_representation_learning_tpu.ops import (
    butter_lowpass_design, butterworth_low_pass, filtfilt_fir, filtfilt_scan, lfilter, odd_ext,
)


def make_ecgish(rng, n=2500, n_lead=3, fs=500.0):
    """Synthetic ECG-ish signals: spiky QRS train + baseline wander + noise."""
    t = np.arange(n) / fs
    out = []
    for i in range(n_lead):
        hr = 1.0 + 0.3 * rng.standard_normal()
        qrs = np.zeros(n)
        phase = (t * hr) % 1.0
        qrs += 800 * np.exp(-((phase - 0.5) ** 2) / (2 * 0.0004))
        wander = 150 * np.sin(2 * np.pi * 0.3 * t + rng.uniform(0, 6)) + 80 * np.sin(
            2 * np.pi * 0.05 * t)
        noise = 20 * rng.standard_normal(n)
        hum = 30 * np.sin(2 * np.pi * 55.0 * t)  # in the stopband region
        out.append(qrs + wander + noise + hum)
    return np.stack(out)


def test_design_matches_reference_constants():
    b, a = butter_lowpass_design(500.0, 50.0, 60.0, 1.0, 2.5)
    # buttord on these specs gives a low, fixed order; design must be stable
    assert len(b) == len(a)
    assert np.all(np.abs(np.roots(a)) < 1.0)


def test_lfilter_matches_scipy(rng):
    x = make_ecgish(rng)
    b, a = butter_lowpass_design()
    want = signal.lfilter(b, a, x, axis=-1)
    got = np.asarray(lfilter(b, a, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_odd_ext_matches_scipy(rng):
    from scipy.signal._arraytools import odd_ext as scipy_odd_ext
    x = rng.standard_normal((2, 50))
    got = np.asarray(odd_ext(jnp.asarray(x), 7))
    want = scipy_odd_ext(x, 7, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)  # f32 device dtype


def test_filtfilt_scan_matches_scipy(rng):
    x = make_ecgish(rng)
    b, a = butter_lowpass_design()
    want = signal.filtfilt(b, a, x, axis=-1)
    got = np.asarray(filtfilt_scan(b, a, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-2)


def test_filtfilt_fir_matches_scipy(rng):
    x = make_ecgish(rng)
    b, a = butter_lowpass_design()
    want = signal.filtfilt(b, a, x, axis=-1)
    got = np.asarray(filtfilt_fir(b, a, jnp.asarray(x)))
    # FIR surrogate: documented tolerance vs exact filtfilt (SURVEY.md §7 risk)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-3 * scale)


def test_filtfilt_kills_stopband(rng):
    # 55 Hz hum sits past the passband edge; zero-phase filter must attenuate it
    n, fs = 2500, 500.0
    t = np.arange(n) / fs
    hum = np.sin(2 * np.pi * 60.0 * t)[None]
    out = np.asarray(butterworth_low_pass(jnp.asarray(hum), fs=fs, method='fir'))
    assert np.abs(out[:, 200:-200]).max() < 0.6  # >= 2.5 dB attenuation at 60 Hz


def test_butterworth_low_pass_batched_shapes(rng):
    x = jnp.asarray(rng.standard_normal((4, 12, 1000)))
    for method in ('fir', 'scan'):
        y = butterworth_low_pass(x, fs=500.0, method=method)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()
