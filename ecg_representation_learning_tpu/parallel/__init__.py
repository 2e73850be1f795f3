"""Parallelism layer: mesh construction + sharding rules (DP x TP/FSDP)."""
from .mesh import (
    DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh, param_shardings, param_spec,
    replicated, shard_params,
)

__all__ = [
    'DATA_AXIS', 'MODEL_AXIS', 'batch_sharding', 'make_mesh', 'param_shardings',
    'param_spec', 'replicated', 'shard_params',
]
