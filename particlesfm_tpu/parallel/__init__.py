from .mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_frames,
    sharded_map_frames,
)
