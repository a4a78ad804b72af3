"""Multi-chip / multi-host execution (mesh topology + sharded runner)."""
from .mesh import (CHAN_AXIS, RAY_AXIS, chan_minor_sharding, init_distributed,
                   make_mesh, pad_to, ray_sharding, replicated)
from .sharded import (ShardedForwardModel, global_put, global_put_local,
                      host_gather)

__all__ = [
    "CHAN_AXIS", "RAY_AXIS", "chan_minor_sharding", "init_distributed",
    "make_mesh", "pad_to", "ray_sharding", "replicated",
    "ShardedForwardModel", "global_put", "global_put_local", "host_gather",
]
