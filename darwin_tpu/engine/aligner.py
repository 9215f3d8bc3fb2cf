"""Tile-batch aligner frontends: one call = DP + traceback on device.

Backend dispatch: the Pallas kernel (ops/pallas_dp.py) on TPU, the
portable lax formulation (ops/reference_dp.py) elsewhere; both share
the traceback.  Equivalent of the reference's Align_Batch_GPU host
wrapper (cuda_host.cu:23-190), minus the per-batch marshaling: tiles
arrive as fixed-shape arrays and results come back as NumPy.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from darwin_tpu.ops.pallas_dp import align_tiles_pallas
from darwin_tpu.ops.reference_dp import align_tiles_jax
from darwin_tpu.ops.traceback import (pack_dir_words6,
                                      traceback_packed6_jax)

TPU_PLATFORMS = ("tpu",)


def default_backend() -> str:
    return "pallas" if jax.default_backend() in TPU_PLATFORMS else "lax"


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
                 gap_extend: int, backend: str = "auto",
                 block_b: int = 128):
        if backend == "auto":
            backend = default_backend()
        self.backend = backend
        self.tile_size = tile_size
        self.early_terminate = early_terminate
        # The Pallas grid needs the batch to divide into blocks; the
        # lax path has no constraint.  Callers pass any batch size and
        # we pad to the block multiple.
        self.block_b = block_b

        def step(ref, query, rlen, qlen, first):
            # packed6: 2-4 walk steps per gather (measured 14.82 ->
            # 13.90 ms/step at the bench shape; the op stream carries
            # in-group holes, which the scoring lookback skips).
            if backend == "pallas":
                out = align_tiles_pallas(
                    ref, query, rlen, qlen, match=match,
                    mismatch=mismatch, gap_open=gap_open,
                    gap_extend=gap_extend,
                    block_b=min(block_b, ref.shape[0]),
                    dir_format="packed6")
                words = out["dir_words"]
            else:
                out = align_tiles_jax(ref, query, rlen, qlen, match=match,
                                      mismatch=mismatch, gap_open=gap_open,
                                      gap_extend=gap_extend)
                words = pack_dir_words6(out["dir"])
            ops, _mb, i_steps, j_steps = traceback_packed6_jax(
                words, rlen, qlen, first, out["max_i"],
                out["max_j"], early_terminate=early_terminate)
            score = jax.numpy.where(first, out["max_score"],
                                    out["pos_score"])
            return (ops.T, i_steps, j_steps, score, out["max_i"],
                    out["max_j"])

        self._step = jax.jit(step)

    def _pad(self, B: int) -> int:
        if self.backend != "pallas":
            return B
        bb = min(self.block_b, max(8, B))
        return -(-B // bb) * bb

    def __call__(self, ref_tiles: np.ndarray, query_tiles: np.ndarray,
                 ref_lens: np.ndarray, query_lens: np.ndarray,
                 firsts: np.ndarray) -> TileResult:
        B = ref_tiles.shape[0]
        BP = self._pad(B)
        if BP != B:
            pad = ((0, BP - B), (0, 0))
            ref_tiles = np.pad(ref_tiles, pad, constant_values=1)
            query_tiles = np.pad(query_tiles, pad, constant_values=2)
            ref_lens = np.pad(ref_lens, (0, BP - B))
            query_lens = np.pad(query_lens, (0, BP - B))
            firsts = np.pad(firsts, (0, BP - B))
        ops, i_s, j_s, score, mi, mj = jax.device_get(self._step(
            ref_tiles, query_tiles, ref_lens.astype(np.int32),
            query_lens.astype(np.int32), firsts.astype(bool)))
        return TileResult(
            ops=np.asarray(ops)[:B], ref_steps=np.asarray(i_s)[:B],
            query_steps=np.asarray(j_s)[:B],
            score=np.asarray(score)[:B],
            max_i=np.asarray(mi)[:B], max_j=np.asarray(mj)[:B])
