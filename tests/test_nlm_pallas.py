"""Pallas NLM kernel parity vs the jnp reference implementation (interpret
mode on CPU; the compiled path is exercised on hardware by the benchmarks)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ecg_representation_learning_tpu.ops.nlm import nlm
from ecg_representation_learning_tpu.ops.nlm_pallas import nlm_pallas


@pytest.mark.parametrize('shape,sw,pw', [
    ((2, 3, 150), 32, 10),
    ((1, 1, 120), None, 5),   # full search
    ((4, 2, 200), 64, 7),
])
def test_nlm_pallas_matches_jnp(rng, shape, sw, pw):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 10)
    want = np.asarray(nlm(x, sch_wd=sw, patch_wd=pw))
    got = np.asarray(nlm_pallas(x, sch_wd=sw, patch_wd=pw, block_rows=8,
                                interpret=True))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-6 * scale)


def test_nlm_pallas_edge_passthrough(rng):
    x = jnp.asarray(rng.standard_normal((1, 100)).astype(np.float32))
    pw = 7
    got = np.asarray(nlm_pallas(x, sch_wd=16, patch_wd=pw, block_rows=8,
                                interpret=True))
    np.testing.assert_allclose(got[0, :pw + 1], np.asarray(x)[0, :pw + 1], rtol=1e-6)
    np.testing.assert_allclose(got[0, -pw:], np.asarray(x)[0, -pw:], rtol=1e-6)
