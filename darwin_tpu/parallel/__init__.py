from darwin_tpu.parallel.mesh import (ShardedTileAligner, make_mesh,
                                      merge_overlap_records,
                                      sharded_tile_step)

__all__ = ["make_mesh", "sharded_tile_step", "ShardedTileAligner",
           "merge_overlap_records"]
