from light_loam_tpu.parallel.sharded import (
    make_mesh,
    shard_mapping_state,
    sharded_mapping_step,
)

__all__ = ["make_mesh", "shard_mapping_state", "sharded_mapping_step"]
