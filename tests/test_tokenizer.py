"""Tokenizer tests: k-means quality, encode/decode roundtrip, thresholds,
persistence, rank-frequency (reference ecg_tokenizer.py capabilities)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecg_representation_learning_tpu.models.tokenizer import (
    EcgTokenizer, fit_power_law, kmeans_fit, nearest_centroid,
)


def test_kmeans_recovers_clusters(rng):
    # 4 well-separated gaussian blobs in 8-D
    centers_true = rng.standard_normal((4, 8)) * 10
    x = np.concatenate([centers_true[i] + 0.1 * rng.standard_normal((100, 8))
                        for i in range(4)])
    centers, counts, inertia = kmeans_fit(jax.random.PRNGKey(0),
                                          jnp.asarray(x, jnp.float32), k=4, n_iter=32)
    centers = np.asarray(centers)
    # every true center matched by some learned center
    d = np.linalg.norm(centers_true[:, None] - centers[None], axis=-1).min(axis=1)
    assert d.max() < 0.5
    np.testing.assert_allclose(np.sort(np.asarray(counts)), [100] * 4)
    assert float(inertia) < 500


def test_kmeans_vs_sklearn_inertia(rng):
    from sklearn.cluster import KMeans
    x = rng.standard_normal((500, 8)).astype(np.float32)
    sk = KMeans(n_clusters=16, n_init=4, random_state=0).fit(x)
    _, _, inertia = kmeans_fit(jax.random.PRNGKey(0), jnp.asarray(x), k=16, n_iter=64)
    assert float(inertia) < sk.inertia_ * 1.1  # within 10% of sklearn


def test_nearest_centroid(rng):
    centers = rng.standard_normal((16, 8)).astype(np.float32)
    x = centers[[3, 7, 7, 0]] + 1e-3
    ids, dist = nearest_centroid(jnp.asarray(x), jnp.asarray(centers))
    np.testing.assert_array_equal(np.asarray(ids), [3, 7, 7, 0])
    assert np.asarray(dist).max() < 0.01


def test_tokenizer_roundtrip(rng):
    sigs = rng.standard_normal((16, 12, 250)).astype(np.float32)
    tok = EcgTokenizer(k=8, pad='shift').fit(sigs, n_clusters=32, n_iter=32)
    ids, means = tok(sigs)
    # 250 -> padded 256 -> 32 segments
    assert ids.shape == (16, 12, 32)
    assert means.shape == (16, 12, 32)
    assert ids.min() >= 0 and ids.max() < 32
    dec = tok.decode(ids, means=means)
    assert dec.shape == (16, 12, 256)
    # decoded + means approximates the padded signal (coarse codebook => loose)
    from ecg_representation_learning_tpu.ops import pad_to_multiple
    padded = np.asarray(pad_to_multiple(jnp.asarray(sigs), 8, 'shift'))
    err = np.abs(dec - padded).mean()
    assert err < np.abs(padded).mean()  # reconstruction beats zero baseline


def test_tokenizer_threshold_filtering(rng):
    sigs = rng.standard_normal((8, 2, 200)).astype(np.float32)
    tok = EcgTokenizer(k=8).fit(sigs, n_clusters=16, n_iter=16)
    big, _ = tok._filtered_codebook(None)
    small, kept = tok._filtered_codebook(int(tok.lens.max()))  # only largest kept
    assert small.shape[0] < big.shape[0]
    ids, _ = tok(sigs, th=int(tok.lens.max()))
    assert ids.max() < small.shape[0]
    # float threshold = fraction of total points
    frac_book, _ = tok._filtered_codebook(0.01)
    assert 1 <= frac_book.shape[0] <= 16


def test_tokenizer_persistence(tmp_path, rng):
    sigs = rng.standard_normal((4, 2, 96)).astype(np.float32)
    tok = EcgTokenizer(k=8).fit(sigs, n_clusters=8, n_iter=8)
    p = tok.save(str(tmp_path / 'tok.pickle'))
    tok2 = EcgTokenizer.load(p)
    np.testing.assert_array_equal(tok.centers, tok2.centers)
    np.testing.assert_array_equal(tok.lens, tok2.lens)
    ids1, _ = tok(sigs)
    ids2, _ = tok2(sigs)
    np.testing.assert_array_equal(ids1, ids2)


def test_rank_frequency_power_law(rng):
    # synthetic zipf-ish sizes: freq = 1000 * rank^-1.5
    tok = EcgTokenizer(k=8)
    ranks = np.arange(1, 65)
    tok.lens = (1000 * ranks ** -1.5).astype(np.int64) + 1
    tok.centers = np.zeros((64, 8), np.float32)
    rf = tok.rank_frequency()
    assert rf['exponent'] < -1.0  # recovers a steep power law
    a, b = fit_power_law(ranks.astype(float), 5.0 * ranks ** -2.0)
    np.testing.assert_allclose(b, -2.0, atol=1e-6)
    np.testing.assert_allclose(a, 5.0, rtol=1e-6)


def test_kmeans_chunked_equivalence(rng):
    # chunked segment-sum Lloyd == whole-array Lloyd (same init, same data)
    import jax
    from ecg_representation_learning_tpu.models.tokenizer import kmeans_fit
    x = jnp.asarray(rng.standard_normal((500, 8)), jnp.float32)
    key = jax.random.PRNGKey(3)
    c_whole, n_whole, i_whole = kmeans_fit(key, x, k=16, n_iter=8, chunk=500)
    c_chunk, n_chunk, i_chunk = kmeans_fit(key, x, k=16, n_iter=8, chunk=64)
    np.testing.assert_allclose(np.asarray(c_whole), np.asarray(c_chunk),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(n_whole), np.asarray(n_chunk))
    np.testing.assert_allclose(float(i_whole), float(i_chunk), rtol=1e-5)


def test_kmeans_large_n_bounded_memory(rng):
    # 1M+ segments in bounded memory: peak is O(chunk x K), never O(N x K) --
    # the round-1 one_hot would have needed N*K*4 = 1 GB+ here (VERDICT #4);
    # 10M-segment scale is exercised on the real chip (PERF.md)
    import jax
    from ecg_representation_learning_tpu.models.tokenizer import (
        kmeans_fit, nearest_centroid)
    n = 1 << 20
    x = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
    centers, counts, inertia = kmeans_fit(jax.random.PRNGKey(0), x, k=256,
                                          n_iter=2)
    assert np.isfinite(np.asarray(centers)).all()
    assert int(np.asarray(counts).sum()) == n
    ids, dist = nearest_centroid(x, centers)
    assert ids.shape == (n,) and int(np.asarray(ids).max()) < 256
    assert np.isfinite(float(inertia))


def test_centroid_grid_renders(tmp_path, rng):
    # the cluster-centroid browser (reference ecg_tokenizer.py:509-624) as a
    # static report: first + last pages render with member-segment overlays
    import os
    os.chdir(tmp_path)
    from ecg_representation_learning_tpu.models.tokenizer import EcgTokenizer
    sigs = rng.standard_normal((12, 2, 160)).astype(np.float32)
    tok = EcgTokenizer(k=8).fit(sigs, n_clusters=48, n_iter=8)
    paths = tok.centroid_grid(sigs=sigs, n_row=2, n_col=4, n_sample=4)
    assert len(paths) == 2  # first + last page (48 clusters / 8 per page)
    assert all(os.path.exists(p) for p in paths)
    # without member overlays (no sigs) it still renders
    paths2 = tok.centroid_grid(n_row=4, n_col=12)  # single page
    assert len(paths2) == 1 and os.path.exists(paths2[0])
