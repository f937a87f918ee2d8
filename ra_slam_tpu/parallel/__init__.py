from ra_slam_tpu.parallel.dist_ba import (
    distributed_bundle_adjustment,
    solve_window_distributed,
)
from ra_slam_tpu.parallel.distributed import (
    global_mesh,
    initialize_distributed,
    process_info,
    replicate_global,
)
from ra_slam_tpu.parallel.sharded_map import (
    create_sharded_map,
    local_config,
    make_gather_shards,
    make_sharded_integrate_step,
    map_partition_specs,
)

__all__ = [
    "create_sharded_map",
    "distributed_bundle_adjustment",
    "global_mesh",
    "initialize_distributed",
    "local_config",
    "make_gather_shards",
    "make_sharded_integrate_step",
    "map_partition_specs",
    "process_info",
    "replicate_global",
    "solve_window_distributed",
]
