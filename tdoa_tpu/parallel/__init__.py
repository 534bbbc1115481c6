from tdoa_tpu.parallel.mesh import (
    make_mesh,
    correlate_pairs_sharded,
    process_blocks_sharded,
)

__all__ = ["make_mesh", "correlate_pairs_sharded", "process_blocks_sharded"]
