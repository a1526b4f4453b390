from .expert_parallel import ep_moe_mlp
from .mesh import DATA_AXIS, MODEL_AXIS, create_mesh, single_device_mesh
from .multihost import (global_params, global_put, launch_local_sim,
                        run_spmd_check)
from .pipeline import (PIPE_AXIS, PipelineInference, create_pipe_mesh,
                       pipeline_lm_loss, pipeline_train_step,
                       stack_pipeline_params, unstack_pipeline_params)
from .ring_attention import ring_prefill_attention
from .seq_parallel import SEQ_AXIS, create_seq_mesh, seq_parallel_prefill
from .sharding import (constrain_decode_pool, constrain_decode_state,
                       constrain_layer_cache, constrain_recent_cache,
                       constrain_tier_cache, data_sharding, param_specs,
                       shard_params, tier_cache_specs)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "PIPE_AXIS", "SEQ_AXIS",
    "PipelineInference", "create_mesh", "create_pipe_mesh",
    "create_seq_mesh", "pipeline_lm_loss", "pipeline_train_step",
    "stack_pipeline_params", "unstack_pipeline_params",
    "ring_prefill_attention", "seq_parallel_prefill", "single_device_mesh",
    "constrain_decode_pool", "constrain_decode_state",
    "constrain_layer_cache", "constrain_recent_cache",
    "constrain_tier_cache", "data_sharding", "param_specs", "shard_params",
    "tier_cache_specs",
    "global_params", "global_put", "launch_local_sim", "run_spmd_check",
    "ep_moe_mlp",
]
