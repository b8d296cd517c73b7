from spfresh_tpu.parallel.cluster_step import (
    replicate,
    shard_rows,
    sharded_cluster_step,
    sharded_replica_pass,
)
from spfresh_tpu.parallel.sharded import ShardedSpannIndex, default_mesh

__all__ = [
    "ShardedSpannIndex",
    "default_mesh",
    "replicate",
    "shard_rows",
    "sharded_cluster_step",
    "sharded_replica_pass",
]
