"""Golden tests: resampling vs scipy (FFT and polyphase paths)."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy import signal

from ecg_representation_learning_tpu.ops import resample_fft, resample_poly, resample_to


@pytest.mark.parametrize('n,num', [(5000, 2500), (2570, 2500), (4000, 2500), (1000, 1300)])
def test_resample_fft_matches_scipy(rng, n, num):
    x = rng.standard_normal((3, n))
    want = signal.resample(x, num, axis=-1)
    got = np.asarray(resample_fft(jnp.asarray(x), num))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6 * np.abs(want).max() + 1e-8)


@pytest.mark.parametrize('up,down', [(1, 2), (250, 257), (5, 8), (1, 4), (2, 1)])
def test_resample_poly_matches_scipy(rng, up, down):
    x = rng.standard_normal((2, 2000))
    want = signal.resample_poly(x, up, down, axis=-1)
    got = np.asarray(resample_poly(jnp.asarray(x), up, down))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('fqs', [500, 1000, 257, 400])
def test_resample_to_grid_lengths(rng, fqs):
    # the four corpus frequencies of the registry must all land on the 250 Hz grid
    n = fqs * 10  # 10-second records
    x = rng.standard_normal((1, 12, n))
    for method in ('fft', 'poly'):
        y = resample_to(jnp.asarray(x), fqs, 250, method=method)
        assert y.shape[-1] == 2500, (fqs, method, y.shape)


def test_resample_identity(rng):
    x = jnp.asarray(rng.standard_normal((2, 100)))
    assert resample_to(x, 250, 250) is x


def test_resample_preserves_tone(rng):
    # a 5 Hz tone at 500 Hz must survive 2x decimation with same amplitude/phase
    fs, n = 500, 5000
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * 5.0 * t)[None]
    for method in ('fft', 'poly'):
        y = np.asarray(resample_to(jnp.asarray(x), fs, 250, method=method))[0]
        t2 = np.arange(y.size) / 250.0
        want = np.sin(2 * np.pi * 5.0 * t2)
        err = np.abs(y[50:-50] - want[50:-50]).max()
        assert err < 1e-2, (method, err)
