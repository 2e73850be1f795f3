"""Parallelism layer: mesh construction + sharding rules (DP x TP/FSDP)."""
from .mesh import (
    DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh, param_shardings, param_spec,
    replicated, shard_params,
)
from .distributed import initialize_distributed, process_local_batch_slice
from .ring_attention import ring_attention

__all__ = [
    'DATA_AXIS', 'MODEL_AXIS', 'batch_sharding', 'make_mesh', 'param_shardings',
    'param_spec', 'replicated', 'shard_params',
    'initialize_distributed', 'process_local_batch_slice',
    'ring_attention',
]
