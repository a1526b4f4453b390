from .mesh import DATA_AXIS, MODEL_AXIS, create_mesh, single_device_mesh
from .sharding import (constrain_tier_cache, data_sharding, param_specs,
                       shard_params, tier_cache_specs)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "create_mesh", "single_device_mesh",
    "constrain_tier_cache", "data_sharding", "param_specs", "shard_params",
    "tier_cache_specs",
]
