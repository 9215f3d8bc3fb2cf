from darwin_tpu.ops.common import (GAP_OPEN_FLAG_D, GAP_OPEN_FLAG_I,
                                   NEG_INF, PAD_QUERY, PAD_REF)
from darwin_tpu.ops.reference_dp import align_tiles_jax
from darwin_tpu.ops.traceback import traceback_jax

__all__ = [
    "NEG_INF", "PAD_REF", "PAD_QUERY",
    "GAP_OPEN_FLAG_I", "GAP_OPEN_FLAG_D",
    "align_tiles_jax", "traceback_jax",
]
