"""Worker for the two-process jax.distributed test (test_resume_and_dist.py).

Run as: python tests/distributed_worker.py <process_id> <num_processes> <port>
Each process owns 2 virtual CPU devices; collectives cross processes via the
Gloo CPU backend.  Verifies a data-parallel gradient all-reduce across hosts:
each process feeds its own batch shard, the sharded-autodiff gradient must
equal the analytic GLOBAL-batch gradient on every process.
"""
import os
import sys


def main():
    pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ecg_representation_learning_tpu.parallel.distributed import (
        initialize_distributed, process_local_batch_slice)

    info = initialize_distributed(f'localhost:{port}', n_proc, pid)
    assert info['num_processes'] == n_proc, info
    assert info['devices'] == 2 * n_proc, info

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()), ('data',))

    # global batch 8, feature 4; each process holds rows [4*pid, 4*pid+4)
    rng = np.random.default_rng(0)          # same seed -> same global data
    x_global = rng.standard_normal((8, 4)).astype(np.float32)
    y_global = rng.standard_normal((8,)).astype(np.float32)
    w = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    sl = process_local_batch_slice(8)
    assert sl == slice(4 * pid, 4 * pid + 4), sl

    bsh = NamedSharding(mesh, P('data'))
    x = jax.make_array_from_process_local_data(bsh, x_global[sl], (8, 4))
    y = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P('data')), y_global[sl], (8,))

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g = jax.jit(jax.grad(loss),
                out_shardings=NamedSharding(mesh, P()))(w, x, y)
    want = 2.0 / 8 * x_global.T @ (x_global @ np.asarray(w) - y_global)
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5)
    print(f'DIST_OK pid={pid}', flush=True)


if __name__ == '__main__':
    main()
