"""Device mesh construction and sharding rules.

The reference has no distributed backend at all (SURVEY.md §2.3: its only
concurrency is a thread-pool file reader; the active trainer is strictly
single-device, train.py:254-255).  This module is the new first-class
parallel layer: a 2-D ``Mesh`` over ('data', 'model') with

  * data parallelism: batches sharded over 'data', gradient all-reduce over
    ICI inserted by GSPMD from the shardings (no hand-written collectives);
  * tensor parallelism (Megatron-style) over 'model': qkv / fc1 kernels
    column-sharded, attention-out / fc2 kernels row-sharded -- expressed as
    PartitionSpecs on the flax param pytree and resolved by pjit/GSPMD;
  * everything else replicated.

Multi-host: ``jax.distributed.initialize`` + the same mesh over all processes
(DCN between slices); the sharding rules are identical.
"""
from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh.  Defaults to all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        assert n % n_model == 0, (n, n_model)
        n_data = n // n_model
    assert n_data * n_model == n, (n_data, n_model, n)
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# --- parameter partition rules -------------------------------------------------
# matched against the '/'-joined flax param path; first hit wins
_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    # column-parallel: shard output features over 'model'
    (r'attn/qkv/kernel$',        P(None, MODEL_AXIS)),
    (r'mlp/fc1/kernel$',         P(None, MODEL_AXIS)),
    (r'mlp/fc1/bias$',           P(MODEL_AXIS)),
    # row-parallel: shard input features over 'model'
    (r'attn/out/kernel$',        P(MODEL_AXIS, None)),
    (r'mlp/fc2/kernel$',         P(MODEL_AXIS, None)),
    # patch embedding: shard the hidden dim
    (r'patch_embed/proj/kernel$', P(None, MODEL_AXIS)),
    # expert parallelism: MoE expert FFN stacks (E, d, f) shard the leading
    # expert axis over 'model' (models/moe.py; the dispatch einsum becomes
    # the expert all-to-all over ICI); the router stays replicated
    (r'moe/w[12]$',              P(MODEL_AXIS, None, None)),
    (r'moe/b[12]$',              P(MODEL_AXIS, None)),
    # everything else replicated (norms, biases, pos/cls embeddings, head)
)


def param_spec(path: str, ndim: int) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.search(pattern, path):
            if ndim == len(spec) + 1:
                # scan-over-layers stacking (VitConfig.scan_blocks): kernels
                # carry a leading (L,) axis -- keep it replicated, shift the
                # rule onto the original dims
                return P(None, *spec)
            if len([a for a in spec if a is not None]) <= ndim:
                return spec
    return P()  # replicated


def _fsdp_spec(spec: P, shape: Tuple[int, ...], n_data: int) -> P:
    """Additionally shard the largest free dim over 'data' (ZeRO-style fully
    sharded storage; GSPMD inserts the all-gathers at use and reduce-scatters
    on the gradients).  Dims already on 'model' stay; indivisible or tiny
    params stay replicated over 'data'."""
    if n_data <= 1 or not shape:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best, best_size = None, 0
    for d, size in enumerate(shape):
        if entries[d] is None and size % n_data == 0 and size > best_size:
            best, best_size = d, size
    if best is None or best_size < 2 * n_data:  # not worth slicing tiny params
        return spec
    entries[best] = DATA_AXIS
    return P(*entries)


def param_shardings(params, mesh: Mesh, fsdp: bool = False):
    """PartitionSpec pytree for a flax param tree (NamedSharding leaves).

    ``fsdp=True`` adds ZeRO-style sharding of parameter (and, via
    :func:`opt_state_shardings`, optimizer-moment) storage over the 'data'
    axis on top of the Megatron 'model' rules.
    """
    n_data = mesh.shape.get(DATA_AXIS, 1)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return '/'.join(getattr(k, 'key', str(k)) for k in kp)

    specs = {}
    for kp, v in flat:
        spec = param_spec(path_str(kp), v.ndim)
        if fsdp:
            spec = _fsdp_spec(spec, tuple(v.shape), n_data)
        specs[path_str(kp)] = spec

    def to_sharding(kp, v):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def opt_state_shardings(opt_state, params_shardings, mesh: Mesh):
    """Shardings for an optax state pytree: subtrees that mirror the param
    tree (Adam's mu/nu moments) get the param shardings -- under FSDP this is
    where most of the memory saving lives -- and every other leaf (counts,
    clip state) is replicated."""
    pstruct = jax.tree.structure(params_shardings)
    rep = replicated(mesh)

    def is_param_tree(node):
        try:
            return jax.tree.structure(node) == pstruct
        except Exception:
            return False

    return jax.tree.map(
        lambda sub: params_shardings if is_param_tree(sub) else rep,
        opt_state, is_leaf=is_param_tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays sharded over 'data' on the leading axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Place a param pytree onto the mesh per the partition rules."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
