from cosmax.parallel.mesh import (
    make_mesh,
    make_multislice_mesh,
    walker_sharding,
    shard_walkers,
    sharded_batched_log_prob,
    data_sharded_chi2,
)

__all__ = [
    "make_mesh",
    "make_multislice_mesh",
    "walker_sharding",
    "shard_walkers",
    "sharded_batched_log_prob",
    "data_sharded_chi2",
]
