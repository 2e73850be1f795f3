"""Blocked flash-attention backward: parity vs XLA at long sequence
(interpret mode; the compiled path is exercised on hardware)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecg_representation_learning_tpu.ops.attention import (
    BLOCKED_BWD_MIN_SEQ, _attn_reference, flash_attention,
)


@pytest.mark.parametrize('t', [1100, 1024])  # unaligned + aligned tails
def test_blocked_backward_parity(rng, t):
    assert t >= BLOCKED_BWD_MIN_SEQ  # exercises the blocked path
    q, k, v = [jnp.asarray(rng.standard_normal((1, 2, t, 64)), dtype=jnp.float32)
               for _ in range(3)]
    with jax.default_matmul_precision('highest'):
        g_ref = jax.grad(lambda a, b, c: (_attn_reference(a, b, c, 0.125) ** 2).sum(),
                         argnums=(0, 1, 2))(q, k, v)
        g_fl = jax.grad(lambda a, b, c: (flash_attention(a, b, c, 0, None, 128, 128,
                                                         True) ** 2).sum(),
                        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fl):
        scale = float(jnp.abs(a).max())
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5 * max(scale, 1.0))


def test_short_seq_uses_recompute_path(rng):
    # below the threshold, residuals carry no lse and the XLA path runs
    q, k, v = [jnp.asarray(rng.standard_normal((1, 2, 41, 64)), dtype=jnp.float32)
               for _ in range(3)]
    with jax.default_matmul_precision('highest'):
        g = jax.grad(lambda a: (flash_attention(a, k, v, 0, None, 128, 128, True) ** 2).sum())(q)
    assert np.isfinite(np.asarray(g)).all()
