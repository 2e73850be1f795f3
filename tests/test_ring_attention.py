"""Ring attention (context parallelism) parity on the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from ecg_representation_learning_tpu.ops.attention import _attn_reference
from ecg_representation_learning_tpu.parallel import make_mesh
from ecg_representation_learning_tpu.parallel.ring_attention import ring_attention


def test_ring_attention_matches_full(rng):
    mesh = make_mesh(n_data=8, n_model=1)
    b, h, t, d = 2, 4, 8 * 16, 32   # sequence 128 sharded over 8 devices
    q, k, v = [jnp.asarray(rng.standard_normal((b, h, t, d)), dtype=jnp.float32)
               for _ in range(3)]
    with jax.default_matmul_precision('highest'):
        want = np.asarray(_attn_reference(q, k, v, 1.0 / np.sqrt(d)))
        got = np.asarray(ring_attention(q, k, v, mesh))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ring_attention_jit_and_grad(rng):
    mesh = make_mesh(n_data=4, n_model=2)  # sequence rides the 'data' axis
    b, h, t, d = 1, 2, 4 * 8, 16
    q, k, v = [jnp.asarray(rng.standard_normal((b, h, t, d)), dtype=jnp.float32)
               for _ in range(3)]

    f = jax.jit(lambda a, bb, c: ring_attention(a, bb, c, mesh).sum())
    with jax.default_matmul_precision('highest'):
        val = f(q, k, v)
        grads = jax.jit(jax.grad(lambda a, bb, c: ring_attention(a, bb, c, mesh).sum(),
                                 argnums=(0, 1, 2)))(q, k, v)
        g_ref = jax.grad(lambda a, bb, c: _attn_reference(a, bb, c, 1 / np.sqrt(d)).sum(),
                         argnums=(0, 1, 2))(q, k, v)
    assert np.isfinite(float(val))
    for g, r in zip(grads, g_ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-4)
