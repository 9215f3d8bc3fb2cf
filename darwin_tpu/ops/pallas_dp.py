"""GACT tile DP as a Pallas TPU kernel.

Semantic twin of align_tiles_jax (reference_dp.py) — same row-wavefront
formulation, same outputs — engineered for the TPU memory hierarchy:

* grid = (batch_blocks, T/8): each step computes 8 sequentially
  dependent DP rows of one batch block (unrolled), writing one
  [BB, 8, TJP] direction-byte block; Mosaic pipelines the HBM writeback
  against the next step's compute.
* DP state (m/i/d rows, shifted query, max trackers) lives in VMEM
  scratch, persisting across the row axis of the grid and reset at
  row-block 0.
* The in-row query-gap cummax runs as a log2(TJP)-step shift-max scan
  on the VPU.
* All arithmetic is int32 (scores are bounded by +-tile_size, but the
  VPU is 32-bit-lane; int16 packing is a future optimization).

Batch vectorizes across sublanes; lanes carry the query axis
(TJP = T+1 rounded up to 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from darwin_tpu.ops.common import (GAP_OPEN_FLAG_D, GAP_OPEN_FLAG_I,
                                   NEG_INF, PAD_QUERY, PAD_REF)

ROWS_PER_STEP = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _shift_right(x, s, fill, lane):
    """out[..., j] = x[..., j-s] for j >= s else fill (lane = iota)."""
    return jnp.where(lane >= s, pltpu.roll(x, shift=s, axis=1),
                     jnp.int32(fill))


def _make_kernel(TJP: int, match: int, mismatch: int,
                 gap_open: int, gap_extend: int):
    def kernel(ref_ref, query_ref, rlen_ref, qlen_ref,     # inputs
               dir_ref, stats_ref,                          # outputs
               m_s, i_s, d_s, qs_s):                        # scratch
        ib = pl.program_id(1)  # row block: DP rows ib*8+1 .. ib*8+8
        BB = m_s.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (BB, TJP), 1)

        @pl.when(ib == 0)
        def _init():
            m_s[:] = jnp.zeros((BB, TJP), jnp.int32)
            i_s[:] = jnp.full((BB, TJP), -NEG_INF, jnp.int32)
            d_s[:] = jnp.full((BB, TJP), -NEG_INF, jnp.int32)
            # qs[:, j] = query[:, j-1]
            q = query_ref[:].astype(jnp.int32)
            qs_s[:] = _shift_right(q, 1, 0, lane)
            stats_ref[:] = jnp.zeros_like(stats_ref)

        rlen = rlen_ref[:]            # [BB, 1]
        qlen = qlen_ref[:]
        qs = qs_s[:]
        jvalid = (lane >= 1) & (lane <= qlen)

        m_prev, i_prev, d_prev = m_s[:], i_s[:], d_s[:]
        max_s = stats_ref[:, 0:1]
        max_i = stats_ref[:, 1:2]
        max_j = stats_ref[:, 2:3]
        pos_s = stats_ref[:, 3:4]

        ref_i32 = ref_ref[:].astype(jnp.int32)

        for r in range(ROWS_PER_STEP):
            i = ib * ROWS_PER_STEP + r  # DP row is i+1
            # Per-item ref char at column i: dynamic single-lane slices
            # are not lowerable on TPU, so select-and-reduce instead.
            rc = jnp.sum(jnp.where(lane == i, ref_i32, 0), axis=1,
                         keepdims=True)                      # [BB, 1]
            match_s = jnp.where(qs == rc, match, mismatch)

            prev3 = jnp.maximum(jnp.maximum(m_prev, i_prev), d_prev)
            m_new = jnp.maximum(
                _shift_right(prev3, 1, 0, lane) + match_s, 0)
            m_new = jnp.where(lane == 0, 0, m_new)

            ins_open = m_prev + gap_open
            ins_ext = i_prev + gap_extend
            i_new = jnp.maximum(ins_open, ins_ext)
            i_new = jnp.where(lane == 0, -NEG_INF, i_new)

            # d[j] = (j-1)*ge + cummax_{l<=j-1}(m[l] + go - l*ge)
            u = m_new + gap_open - lane * gap_extend
            s = 1
            while s < TJP:
                u = jnp.maximum(u, _shift_right(u, s, -NEG_INF, lane))
                s *= 2
            d_new = _shift_right(u, 1, -NEG_INF, lane) \
                + (lane - 1) * gap_extend
            d_new = jnp.where(lane == 0, -NEG_INF, d_new)

            h = jnp.maximum(jnp.maximum(m_new, i_new),
                            jnp.maximum(d_new, 0))

            del_open = _shift_right(m_new, 1, 0, lane) + gap_open
            del_ext = _shift_right(d_new, 1, -NEG_INF, lane) + gap_extend

            op = jnp.where(m_new >= i_new,
                           jnp.where(m_new >= d_new, 3, 1),
                           jnp.where(i_new >= d_new, 2, 1))
            op = jnp.where((m_new <= 0) & (i_new <= 0) & (d_new <= 0),
                           0, op)
            op += jnp.where(ins_open >= ins_ext, GAP_OPEN_FLAG_I, 0)
            op += jnp.where(del_open >= del_ext, GAP_OPEN_FLAG_D, 0)

            valid = jvalid & (i + 1 <= rlen)
            dir_ref[:, r, :] = jnp.where(valid, op, 0).astype(jnp.uint8)

            # Max tracking: last row-major cell wins at >=
            # (align.cpp:173-177).
            hv = jnp.where(jvalid, h, -1)
            row_max = jnp.max(hv, axis=1, keepdims=True)
            row_j = jnp.max(jnp.where(hv == row_max, lane, -1), axis=1,
                            keepdims=True)
            upd = (row_max >= max_s) & (i + 1 <= rlen)
            max_s = jnp.where(upd, row_max, max_s)
            max_i = jnp.where(upd, i + 1, max_i)
            max_j = jnp.where(upd, row_j, max_j)

            corner = jnp.sum(jnp.where(lane == qlen, h, 0), axis=1,
                             keepdims=True)
            pos_s = jnp.where(i + 1 == rlen, corner, pos_s)

            m_prev, i_prev, d_prev = m_new, i_new, d_new

        m_s[:] = m_prev
        i_s[:] = i_prev
        d_s[:] = d_prev
        stats_ref[:, 0:1] = max_s
        stats_ref[:, 1:2] = max_i
        stats_ref[:, 2:3] = max_j
        stats_ref[:, 3:4] = pos_s

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("match", "mismatch", "gap_open", "gap_extend",
                     "block_b", "interpret"))
def align_tiles_pallas(ref: jnp.ndarray, query: jnp.ndarray,
                       ref_len: jnp.ndarray, query_len: jnp.ndarray,
                       *, match: int, mismatch: int, gap_open: int,
                       gap_extend: int, block_b: int = 256,
                       interpret: bool = False):
    """Same contract as align_tiles_jax; B must divide by block_b and
    T by 8 (the engine's tile geometry guarantees both).

    ref/query: [B, T] uint8 (padded with PAD_REF/PAD_QUERY).
    Returns dict(dir=[B, T, TJP] uint8, max_score, max_i, max_j,
    pos_score: [B] int32).
    """
    B, T = ref.shape
    BB = min(block_b, B)
    assert B % BB == 0, (B, BB)
    assert T % ROWS_PER_STEP == 0, T
    TJP = _round_up(T + 1, 128)

    # Lane-pad the sequences so tile byte j sits at lane j.
    refp = jnp.pad(ref, ((0, 0), (0, TJP - T)), constant_values=PAD_REF)
    queryp = jnp.pad(query, ((0, 0), (0, TJP - T)),
                     constant_values=PAD_QUERY)
    rlen = ref_len.astype(jnp.int32).reshape(B, 1)
    qlen = query_len.astype(jnp.int32).reshape(B, 1)

    grid = (B // BB, T // ROWS_PER_STEP)
    kernel = _make_kernel(TJP, match, mismatch, gap_open, gap_extend)
    dirm, stats = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BB, TJP), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, TJP), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BB, ROWS_PER_STEP, TJP),
                         lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 4), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, TJP), jnp.uint8),
            jax.ShapeDtypeStruct((B, 4), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, TJP), jnp.int32),
            pltpu.VMEM((BB, TJP), jnp.int32),
            pltpu.VMEM((BB, TJP), jnp.int32),
            pltpu.VMEM((BB, TJP), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # The unrolled 8-row body keeps several [BB, TJP] int32
            # temporaries live; allow Mosaic more scoped VMEM than the
            # 16M default (v5e has 128M physical VMEM).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(refp, queryp, rlen, qlen)

    return dict(dir=dirm, max_score=stats[:, 0], max_i=stats[:, 1],
                max_j=stats[:, 2], pos_score=stats[:, 3])
