"""Golden tests: non-local means vs a direct NumPy transcription of the
published Darbon/Zheng algorithm (the same semantics the reference ports at
data_preprocessor.py:75-148), including its edge-passthrough and index quirks.
"""
import math
import sys

import numpy as np
import jax.numpy as jnp
from scipy import stats

from ecg_representation_learning_tpu.ops import est_noise_std, nlm


def numpy_est_noise_std(arr):
    """Reference formula (data_preprocessor.py:75-80) in plain numpy."""
    res = arr.copy()
    for i in range(1, arr.size - 1):
        res[i] = (2 * res[i] - res[i - 1] - res[i + 1]) / math.sqrt(6)
    return stats.median_abs_deviation(1.4826 * (res - np.median(res)))


def numpy_nlm(sig, scale, sch_wd, patch_wd):
    """Direct per-point NLM with Darbon cumulative SSD, as golden."""
    n = sig.size
    p_vec = range(-(sch_wd - 1), sch_wd)
    out = np.full(n, np.nan)
    i_start, i_end = patch_wd + 1, n - patch_wd
    out[i_start:i_end] = 0.0
    z = np.zeros(n)
    sigma = numpy_est_noise_std(sig)
    h = 2 * (2 * patch_wd + 1) * (scale * sigma) ** 2
    for idx in p_vec:
        k = np.arange(n)
        kplus = k + idx
        good = (kplus >= 0) & (kplus < n)
        ssd = np.zeros(n)
        ssd[good] = (sig[k[good]] - sig[kplus[good]]) ** 2
        sdx = np.cumsum(ssd)
        for ii in range(i_start, i_end):
            dist = sdx[ii + patch_wd] - sdx[ii - patch_wd - 1]
            w = math.exp(-dist / h)
            t = ii + idx
            if 0 < t < n:
                out[ii] += w * sig[t]
                z[ii] += w
    out = out / (z + sys.float_info.epsilon)
    out[:patch_wd + 1] = sig[:patch_wd + 1]
    out[-patch_wd:] = sig[-patch_wd:]
    return out


def make_sig(rng, n=160):
    t = np.arange(n) / 250.0
    clean = 50 * np.sin(2 * np.pi * 3.0 * t)
    return (clean + 4.0 * rng.standard_normal(n)).astype(np.float64)


def test_est_noise_std_matches(rng):
    x = make_sig(rng)
    want = numpy_est_noise_std(x)
    got = float(est_noise_std(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_est_noise_std_batched(rng):
    x = rng.standard_normal((3, 4, 100))
    got = np.asarray(est_noise_std(jnp.asarray(x)))
    assert got.shape == (3, 4)
    for i in range(3):
        for j in range(4):
            np.testing.assert_allclose(got[i, j], numpy_est_noise_std(x[i, j].copy()),
                                       rtol=1e-4)


def test_nlm_full_search_matches_golden(rng):
    x = make_sig(rng, n=120)
    want = numpy_nlm(x, scale=1.5, sch_wd=x.size, patch_wd=10)
    got = np.asarray(nlm(jnp.asarray(x), scale=1.5, sch_wd=None, patch_wd=10))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_nlm_bounded_search_matches_golden(rng):
    x = make_sig(rng, n=150)
    want = numpy_nlm(x, scale=1.5, sch_wd=32, patch_wd=5)
    got = np.asarray(nlm(jnp.asarray(x), scale=1.5, sch_wd=32, patch_wd=5))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_nlm_edges_passthrough(rng):
    x = make_sig(rng, n=100)
    patch = 7
    got = np.asarray(nlm(jnp.asarray(x), sch_wd=16, patch_wd=patch))
    np.testing.assert_allclose(got[:patch + 1], x[:patch + 1], rtol=1e-5)
    np.testing.assert_allclose(got[-patch:], x[-patch:], rtol=1e-5)


def test_nlm_batched(rng):
    x = rng.standard_normal((2, 3, 100))
    got = np.asarray(nlm(jnp.asarray(x), sch_wd=16, patch_wd=5))
    assert got.shape == x.shape
    for i in range(2):
        for j in range(3):
            want = numpy_nlm(x[i, j].copy(), 1.5, 16, 5)
            np.testing.assert_allclose(got[i, j], want, rtol=1e-3, atol=1e-3)


def test_nlm_denoises(rng):
    # NLM must reduce noise on a slowly-varying signal (where the
    # second-difference noise estimator is accurate; a high-curvature signal
    # inflates sigma and over-smooths -- a property of the published algorithm)
    n = 500
    t = np.arange(n) / 250.0
    clean = 50 * np.sin(2 * np.pi * 0.5 * t)
    x = clean + 4.0 * rng.standard_normal(n)
    got = np.asarray(nlm(jnp.asarray(x), sch_wd=64, patch_wd=10))
    inner = slice(20, -20)
    rmse_in = np.sqrt(((x - clean)[inner] ** 2).mean())
    rmse_out = np.sqrt(((got - clean)[inner] ** 2).mean())
    assert rmse_out < rmse_in * 0.85
