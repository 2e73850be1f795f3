"""Parallelism layer: mesh + sharding rules (DP x TP), ring context
parallelism, GPipe pipeline parallelism, multi-host init."""
from .mesh import (
    DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh, opt_state_shardings, param_shardings, param_spec,
    replicated, shard_params,
)
from .distributed import initialize_distributed, process_local_batch_slice
from .ring_attention import ring_attention, ring_attention_local
from .pipeline_parallel import (
    STAGE_AXIS, pipeline_apply, place_stage_params, stack_stage_params,
)

__all__ = [
    'DATA_AXIS', 'MODEL_AXIS', 'batch_sharding', 'make_mesh', 'opt_state_shardings', 'param_shardings',
    'param_spec', 'replicated', 'shard_params',
    'initialize_distributed', 'process_local_batch_slice',
    'ring_attention', 'ring_attention_local',
    'STAGE_AXIS', 'pipeline_apply', 'place_stage_params', 'stack_stage_params',
]
