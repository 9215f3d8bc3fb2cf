"""GACT tile DP as a Pallas TPU kernel.

Semantic twin of align_tiles_jax (reference_dp.py) — same outputs,
same row-wavefront formulation — engineered for the TPU memory
hierarchy:

* grid = (batch_blocks, T/8): each step computes 8 sequentially
  dependent DP rows of one batch block (unrolled), writing one
  [BB, 8, TJP] direction-byte block; Mosaic pipelines the HBM writeback
  against the next step's compute.
* DP state lives in VMEM scratch, persisting across the row axis of
  the grid and reset at row-block 0.
* ref arrives transposed ([T, B]) so each step loads its 8 ref chars
  as a [8, BB] block and transposes once — no per-row gather.
* max-cell tracking is deferred: per-lane running (bestH, bestI) with
  h >= bestH updates reproduce the reference's row-major-last tie rule
  (align.cpp:173-177) after a single per-block reduction at the last
  step; likewise the anchor-corner score.
* the in-row query-gap cummax runs as a log2-step shift-max scan on
  the VPU.
* scores are int32 (Mosaic on this target cannot legalize 16-bit
  vector max; see _score_dtype).  The reference's -INF becomes a
  finite sentinel with proven headroom against wraparound.
* each dir byte also carries MATCH_BIT (char equality) so downstream
  rescoring needs no sequence gathers.

Batch vectorizes across sublanes; lanes carry the query axis
(TJP = T+1 rounded up to 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from darwin_tpu.utils import round_up as _round_up
from darwin_tpu.ops.common import (GAP_OPEN_FLAG_D, GAP_OPEN_FLAG_I,
                                   MATCH_BIT, NEG_INF, PAD_QUERY)

ROWS_PER_STEP = 8
NEG16 = -20000  # int16 -INF sentinel; bounds checked in _score_dtype


def _score_dtype(T: int, match: int, mismatch: int, gap_open: int,
                 gap_extend: int):
    """Score dtype for the DP state.

    int16 would halve the vector registers per op (scores are bounded
    by (T+2) * max|param|), but the v5e VPU rejects 16-bit iota and
    comparisons ("Target does not support this comparison"), so int32
    it is on this generation.  The plumbing stays dtype-parametric for
    targets that do support int16.
    """
    del T, match, mismatch, gap_open, gap_extend
    return jnp.int32, -NEG_INF


def _make_kernel(T: int, TJP: int, match: int, mismatch: int,
                 gap_open: int, gap_extend: int, sdt, neg_inf: int,
                 fmt: str, interleave: int = 1):
    # Word-emitting formats carry prior-row state in extra scratch:
    # "packed" one t-word row; "packed6" the t5 row plus a 3-row
    # shifted-byte history for the diagonal fields.
    n_hist = {"bytes": 0, "packed": 1, "packed6": 4}[fmt]
    n_row_blocks = T // ROWS_PER_STEP

    def kernel(refT_ref, query_ref, rlen_ref, qlen_ref,    # inputs
               dir_ref, stats_ref,                          # outputs
               m_s, i_s, qs_s, bh_s, bi_s, ph_s, p3_s,
               *maybe_tp):                                  # scratch
        tp_s = maybe_tp[0] if n_hist >= 1 else None
        hist_s = maybe_tp[1:n_hist] if n_hist > 1 else ()
        ib = pl.program_id(1)  # row block: DP rows ib*8+1 .. ib*8+8
        BB = m_s.shape[0]
        # 16-bit iota is unsupported in hardware; generate 32-bit, cast.
        lane = jax.lax.broadcasted_iota(jnp.int32, (BB, TJP),
                                        1).astype(sdt)

        def c(v):  # scalar constant in the score dtype
            return jnp.asarray(v, sdt)

        def shift_right(x, s, fill):
            # Concat-based lane shift: pltpu.roll rejects int16 operands
            # and would need a lane mask anyway.
            head = jnp.full((x.shape[0], s), fill, sdt)
            return jnp.concatenate([head, x[:, :-s]], axis=1)

        def shift_left(x):
            tail = jnp.zeros((x.shape[0], 1), x.dtype)
            return jnp.concatenate([x[:, 1:], tail], axis=1)

        @pl.when(ib == 0)
        def _init():
            m_s[:] = jnp.zeros((BB, TJP), sdt)
            i_s[:] = jnp.full((BB, TJP), neg_inf, sdt)
            # qs[:, j] = query[:, j-1]
            q = query_ref[:].astype(sdt)
            qs_s[:] = shift_right(q, 1, 0)
            bh_s[:] = jnp.full((BB, TJP), -1, sdt)
            bi_s[:] = jnp.zeros((BB, TJP), sdt)
            ph_s[:] = jnp.zeros((BB, TJP), sdt)
            # max(m, i, d) of DP row 0 = max(0, -inf, -inf) = 0.
            p3_s[:] = jnp.zeros((BB, TJP), sdt)
            if n_hist >= 1:
                tp_s[:] = jnp.zeros((BB, TJP), jnp.int32)
            for h in hist_s:
                h[:] = jnp.zeros((BB, TJP), jnp.int32)

        rlen = rlen_ref[:].astype(sdt)      # [BB, 1]
        qlen = qlen_ref[:].astype(sdt)
        qs_full = qs_s[:]

        # 8 ref chars for this row block: [8, BB] -> [BB, 8].
        rc8 = refT_ref[:].astype(sdt).T

        # Lane-derived constants, loop-invariant across the 8 rows.
        u_base = c(gap_open) - lane * c(gap_extend)
        d_base = (lane - c(1)) * c(gap_extend)
        lane0 = lane == c(0)
        jvalid = (lane >= c(1)) & (lane <= qlen)
        go_minus_ge = c(gap_open - gap_extend)

        # ILP streams: split the batch block into `interleave`
        # independent sub-blocks and alternate their row updates in the
        # unrolled body, so one stream's independent work can fill the
        # other's ~log2(TJP)-step serial shift-max latency (the CUDA
        # kernel's 8x8 register blocking serves the same purpose,
        # cuda_header.h:156-243).  interleave=1 is the plain kernel;
        # results are bit-identical for any value.
        H = BB // interleave
        # Scratch is read full-width and sliced as VALUES, and only
        # full-lane-width ([*, TJP]) values are ever sliced: Mosaic
        # aborts on hardware both on sub-block ref reads/writes and on
        # sublane-slices of narrow ([BB, 1] / [BB, 8]) values (array.h
        # Check failed: limits <= dim), so rlen broadcasts to lane
        # width first and the per-row ref char is broadcast before the
        # per-stream split.
        m_full, i_full = m_s[:], i_s[:]
        bh_full, bi_full, ph_full = bh_s[:], bi_s[:], ph_s[:]
        p3_full = p3_s[:]
        tp_full = tp_s[:] if n_hist >= 1 else None
        hist_full = [h[:] for h in hist_s]
        rlen_bc = jnp.broadcast_to(rlen, (BB, TJP))
        streams = []
        for si in range(interleave):
            z = slice(si * H, (si + 1) * H)
            # d never feeds the next row directly (prev3 = max(m,i,d)
            # does), so no d scratch is carried.
            streams.append(dict(
                z=z, qs=qs_full[z], rlen=rlen_bc[z],
                ub=u_base[z], db=d_base[z], l0=lane0[z], jv=jvalid[z],
                m=m_full[z], i=i_full[z], bh=bh_full[z], bi=bi_full[z],
                ph=ph_full[z], p3=p3_full[z],
                tp=(tp_full[z] if n_hist >= 1 else None),
                **({"c1a": hist_full[0][z], "c1b": hist_full[1][z],
                    "c1c": hist_full[2][z]} if n_hist > 1 else {})))

        def row_update(sv, r, rc):
            i = ib * ROWS_PER_STEP + r  # DP row is i+1
            ip1 = jax.lax.convert_element_type(i + 1, sdt)
            is_eq = sv["qs"] == rc
            match_s = jnp.where(is_eq, c(match), c(mismatch))

            m_new = jnp.maximum(shift_right(sv["p3"], 1, 0) + match_s,
                                c(0))
            m_new = jnp.where(sv["l0"], c(0), m_new)

            ins_open = sv["m"] + c(gap_open)
            ins_ext = sv["i"] + c(gap_extend)
            i_new = jnp.maximum(ins_open, ins_ext)
            if gap_open > 0:
                # Lane 0 is DP column 0 (i = -inf).  With the usual
                # non-positive gap penalties its stray value
                # max(go, ...) never escapes: every cross-lane use
                # shifts right and prev3[0] = max(0, go, -inf) = 0.
                # Only a positive gap_open needs the explicit mask.
                i_new = jnp.where(sv["l0"], c(neg_inf), i_new)

            # d[j] = (j-1)*ge + cummax_{l<=j-1}(m[l] + go - l*ge)
            u = m_new + sv["ub"]
            s = 1
            while s < TJP:
                u = jnp.maximum(u, shift_right(u, s, neg_inf))
                s *= 2
            # Lane 0 needs no mask: the shift fills -inf and d_base[0]
            # is a tiny constant, so d_new[0] stays hugely negative.
            d_new = shift_right(u, 1, neg_inf) + sv["db"]

            mx3 = jnp.maximum(jnp.maximum(m_new, i_new), d_new)
            h = jnp.maximum(mx3, c(0))

            # flag_D compares del_open = shift(m_new)+go against
            # del_ext = shift(d_new)+ge; both operands are shifted by
            # one lane, so compare unshifted and shift the boolean —
            # saves a full-width shift+add pair.  Head lane: d is -inf,
            # open wins, so fill with 1.
            fd_u = (m_new + go_minus_ge >= d_new).astype(sdt)
            flag_d = shift_right(fd_u, 1, 1) != c(0)

            op = jnp.where(m_new >= i_new,
                           jnp.where(m_new >= d_new, c(3), c(1)),
                           jnp.where(i_new >= d_new, c(2), c(1)))
            # h == 0 iff max(m, i, d) <= 0: the reference ZERO rule.
            op = jnp.where(h == c(0), c(0), op)
            op = op + jnp.where(ins_open >= ins_ext,
                                c(GAP_OPEN_FLAG_I), c(0))
            op = op + jnp.where(flag_d, c(GAP_OPEN_FLAG_D), c(0))
            op = op + jnp.where(is_eq, c(MATCH_BIT), c(0))

            rvalid = ip1 <= sv["rlen"]
            valid = sv["jv"] & rvalid
            opb = jnp.where(valid, op, c(0))
            if fmt == "packed":
                # Traceback word: this cell, its right-lane neighbour,
                # and the same pair from the row above — one int32
                # gather then yields the walker's current cell plus all
                # three move targets (see traceback_packed_jax).
                t = (opb + (shift_left(opb) << 8)).astype(jnp.int32)
                row_out = t + (sv["tp"] << 16)
                sv["tp"] = t
            elif fmt == "packed6":
                # 5-bit-field word (see pack_dir_words6): the 2x2 quad
                # plus the MM and MMM diagonal cells, carried via a
                # 3-row shifted-byte history so a match-run walker
                # advances up to 4 steps per gather.
                t5 = (opb + (shift_left(opb) << 5)).astype(jnp.int32)
                d1 = shift_right(opb, 1, 0).astype(jnp.int32)
                row_out = (t5 + (sv["tp"] << 10) + (sv["c1b"] << 20)
                           + (shift_right(sv["c1c"], 1, 0) << 25))
                sv["tp"] = t5
                sv["c1c"] = sv["c1b"]
                sv["c1b"] = sv["c1a"]
                sv["c1a"] = d1
            else:
                row_out = opb.astype(jnp.uint8)

            # Deferred max tracking: per-lane last row attaining the
            # column max (>= update = last wins, matching row-major).
            upd = (h >= sv["bh"]) & rvalid
            sv["bh"] = jnp.where(upd, h, sv["bh"])
            sv["bi"] = jnp.where(upd, ip1, sv["bi"])
            sv["ph"] = jnp.where(ip1 == sv["rlen"], h, sv["ph"])

            sv["m"], sv["i"] = m_new, i_new
            sv["p3"] = mx3
            return row_out

        for r in range(ROWS_PER_STEP):
            # One full-width store per row: Mosaic rejects sub-block
            # stores to the dir ref on hardware (sublane-sliced write
            # to a block dim), so streams hand back their row slices
            # and a single concat reassembles them.
            rcb = jnp.broadcast_to(rc8[:, r: r + 1], (BB, TJP))
            rows = [row_update(sv, r, rcb[sv["z"]]) for sv in streams]
            dir_ref[:, r, :] = (rows[0] if interleave == 1
                                else jnp.concatenate(rows, axis=0))

        def cat(key):
            if interleave == 1:
                return streams[0][key]
            return jnp.concatenate([sv[key] for sv in streams], axis=0)

        best_h, best_i, pos_h = cat("bh"), cat("bi"), cat("ph")
        m_s[:] = cat("m")
        i_s[:] = cat("i")
        bh_s[:] = best_h
        bi_s[:] = best_i
        ph_s[:] = pos_h
        p3_s[:] = cat("p3")
        if n_hist >= 1:
            tp_s[:] = cat("tp")
        if n_hist > 1:
            hist_s[0][:] = cat("c1a")
            hist_s[1][:] = cat("c1b")
            hist_s[2][:] = cat("c1c")

        @pl.when(ib == n_row_blocks - 1)
        def _finalize():
            lane32 = jax.lax.broadcasted_iota(jnp.int32, (BB, TJP), 1)
            bh32 = best_h.astype(jnp.int32)
            bi32 = best_i.astype(jnp.int32)
            jv = (lane32 >= 1) & (lane32 <= qlen.astype(jnp.int32))
            hv = jnp.where(jv, bh32, -1)
            gmax = jnp.max(hv, axis=1, keepdims=True)
            # Among max cells, reference keeps the row-major-last:
            # largest i, then largest j (align.cpp:173, also the CUDA
            # rule cuda_header.h:202-222).
            key = jnp.where(hv == gmax, bi32 * (T + 2) + lane32, -1)
            kmax = jnp.max(key, axis=1, keepdims=True)
            found = kmax >= 0
            stats_ref[:, 0:1] = jnp.where(found, gmax, 0)
            stats_ref[:, 1:2] = jnp.where(found, kmax // (T + 2), 0)
            stats_ref[:, 2:3] = jnp.where(found, kmax % (T + 2), 0)
            stats_ref[:, 3:4] = jnp.sum(
                jnp.where(lane32 == qlen.astype(jnp.int32),
                          pos_h.astype(jnp.int32), 0),
                axis=1, keepdims=True)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("match", "mismatch", "gap_open", "gap_extend",
                     "block_b", "interpret", "dir_format", "interleave"))
def align_tiles_pallas(ref: jnp.ndarray, query: jnp.ndarray,
                       ref_len: jnp.ndarray, query_len: jnp.ndarray,
                       *, match: int, mismatch: int, gap_open: int,
                       gap_extend: int, block_b: int = 128,
                       interpret: bool = False,
                       dir_format: str = "bytes",
                       interleave: int = 1):
    """Same contract as align_tiles_jax; B must divide by block_b and
    T by 8 (the engine's tile geometry guarantees both).

    ref/query: [B, T] uint8 (padded with PAD_REF/PAD_QUERY).
    Returns dict(dir=[B, T, TJP] uint8, max_score, max_i, max_j,
    pos_score: [B] int32).  With dir_format="packed", `dir` is replaced
    by `dir_words`: [B, T, TJP] int32 traceback words (each cell packed
    with its right / up / up-right neighbours; consumed by
    traceback_packed_jax, which advances two steps per gather).  With
    dir_format="packed6", `dir_words` carries the 5-bit-field layout of
    pack_dir_words6 (quad + MM/MMM diagonal cells; consumed by
    traceback_packed6_jax, 2-4 steps per gather).
    """
    B, T = ref.shape
    BB = min(block_b, B)
    assert B % BB == 0, (B, BB)
    assert T % ROWS_PER_STEP == 0, T
    assert dir_format in ("bytes", "packed", "packed6"), dir_format
    # Sub-blocks must stay sublane-aligned (8 int32 sublanes/vreg).
    assert interleave == 1 or BB % (interleave * 8) == 0, \
        (BB, interleave)
    packed = dir_format != "bytes"
    TJP = _round_up(T + 1, 128)
    sdt_np, neg_inf = _score_dtype(T, match, mismatch, gap_open,
                                   gap_extend)

    refT = ref.T  # [T, B]: row block i loads its 8 chars as [8, BB]
    queryp = jnp.pad(query, ((0, 0), (0, TJP - T)),
                     constant_values=PAD_QUERY)
    rlen = ref_len.astype(jnp.int32).reshape(B, 1)
    qlen = query_len.astype(jnp.int32).reshape(B, 1)

    grid = (B // BB, T // ROWS_PER_STEP)
    kernel = _make_kernel(T, TJP, match, mismatch, gap_open, gap_extend,
                          sdt_np, neg_inf, dir_format, interleave)
    scratch = [
        pltpu.VMEM((BB, TJP), sdt_np),  # m
        pltpu.VMEM((BB, TJP), sdt_np),  # i
        pltpu.VMEM((BB, TJP), sdt_np),  # shifted query
        pltpu.VMEM((BB, TJP), sdt_np),  # best_h
        pltpu.VMEM((BB, TJP), sdt_np),  # best_i
        pltpu.VMEM((BB, TJP), sdt_np),  # pos_h
        pltpu.VMEM((BB, TJP), sdt_np),  # prev3 = max(m, i, d)
    ]
    n_hist = {"bytes": 0, "packed": 1, "packed6": 4}[dir_format]
    for _ in range(n_hist):  # prior-row word + packed6 byte history
        scratch.append(pltpu.VMEM((BB, TJP), jnp.int32))
    dirm, stats = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS_PER_STEP, BB), lambda b, i: (i, b),
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
            jax.ShapeDtypeStruct((B, T, TJP),
                                 jnp.int32 if packed else jnp.uint8),
            jax.ShapeDtypeStruct((B, 4), jnp.int32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # The unrolled 8-row body keeps several [BB, TJP]
            # temporaries live; allow Mosaic more scoped VMEM than the
            # 16M default (v5e has 128M physical VMEM).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(refT, queryp, rlen, qlen)

    out = dict(max_score=stats[:, 0], max_i=stats[:, 1],
               max_j=stats[:, 2], pos_score=stats[:, 3])
    out["dir_words" if packed else "dir"] = dirm
    return out
