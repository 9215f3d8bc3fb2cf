"""Tile-batch aligner frontends: one call = DP + traceback on device.

`JaxTileAligner` is the portable backend (any JAX platform); the Pallas
TPU kernel plugs in behind the same interface (see ops/pallas_dp.py).
Equivalent of the reference's Align_Batch_GPU host wrapper
(cuda_host.cu:23-190), minus the per-batch marshaling: tiles arrive as
fixed-shape arrays and results come back as NumPy.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from darwin_tpu.ops.reference_dp import align_tiles_jax
from darwin_tpu.ops.traceback import traceback_jax


@dataclasses.dataclass
class TileResult:
    ops: np.ndarray        # [B, S] uint8, arrival order, 0 = none
    ref_steps: np.ndarray  # [B] int32 (kernel i_steps)
    query_steps: np.ndarray  # [B] int32 (kernel j_steps)
    score: np.ndarray      # [B] int32: max score (first) / corner score
    max_i: np.ndarray      # [B] int32 (1-indexed, first tiles only)
    max_j: np.ndarray      # [B] int32


class JaxTileAligner:
    def __init__(self, *, tile_size: int, early_terminate: int,
                 match: int, mismatch: int, gap_open: int,
                 gap_extend: int, device=None):
        self.tile_size = tile_size
        self.early_terminate = early_terminate
        self._device = device

        def step(ref, query, rlen, qlen, first):
            out = align_tiles_jax(ref, query, rlen, qlen, match=match,
                                  mismatch=mismatch, gap_open=gap_open,
                                  gap_extend=gap_extend)
            ops, i_steps, j_steps = traceback_jax(
                out["dir"], rlen, qlen, first, out["max_i"],
                out["max_j"], early_terminate=early_terminate)
            score = jax.numpy.where(first, out["max_score"],
                                    out["pos_score"])
            return (ops.T, i_steps, j_steps, score, out["max_i"],
                    out["max_j"])

        self._step = jax.jit(step, device=device)

    def __call__(self, ref_tiles: np.ndarray, query_tiles: np.ndarray,
                 ref_lens: np.ndarray, query_lens: np.ndarray,
                 firsts: np.ndarray) -> TileResult:
        ops, i_s, j_s, score, mi, mj = jax.device_get(self._step(
            ref_tiles, query_tiles, ref_lens.astype(np.int32),
            query_lens.astype(np.int32), firsts.astype(bool)))
        return TileResult(ops=np.asarray(ops), ref_steps=np.asarray(i_s),
                          query_steps=np.asarray(j_s),
                          score=np.asarray(score),
                          max_i=np.asarray(mi), max_j=np.asarray(mj))
