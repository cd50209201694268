from tpusparse.dist.mesh import (
    field_sharding,
    make_mesh,
    replicated,
    shard_hierarchy,
    shard_system,
)

__all__ = [
    "make_mesh",
    "field_sharding",
    "replicated",
    "shard_system",
    "shard_hierarchy",
]
