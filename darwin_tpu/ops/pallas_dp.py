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

ILP streams (interleave > 1): the row update's critical path is the
~log2(TJP)-step serial shift-max scan, so a second *independent*
batch stream can fill its latency slots if the VPU co-issues — the
CUDA kernel's 8x8 register blocking exists for exactly this
(cuda_header.h:156-243).  Every stream gets its OWN production-shaped
refs (separate inputs, separate [H, TJP] scratch, a stacked output
indexed by a static leading dim): Mosaic on this chip aborts on
sublane SUB-RANGE slicing of refs/values (array.h Check failed:
limits <= dim), so the split happens entirely at the BlockSpec level
and no value is ever sliced below full width inside the kernel.
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

# Scratch refs per stream: m, i, qs, best_h, best_i, pos_h, prev3.
_N_STATE = 7
_N_HIST = {"bytes": 0, "packed": 1, "packed6": 4}


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


def _tile_math(T: int, TJP: int, match: int, mismatch: int,
               gap_open: int, gap_extend: int, sdt, neg_inf: int,
               fmt: str):
    """Row-wavefront DP math for ONE independent batch stream.

    All functions operate on [H, TJP] values held in/returned via a
    state dict `sv`; both the plain kernel and the ILP-stream kernel
    are thin ref-plumbing around these closures, so they are
    bit-identical by construction.
    """
    n_hist = _N_HIST[fmt]

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

    def make_sv(lane, q_shifted, rlen, qlen, state):
        """Assemble the stream dict from lane iota [H, TJP], the
        pre-shifted query, rlen/qlen [H, 1], and the scratch reads."""
        H = lane.shape[0]
        sv = dict(qs=q_shifted,
                  rlen=jnp.broadcast_to(rlen, (H, TJP)),
                  ub=c(gap_open) - lane * c(gap_extend),
                  db=(lane - c(1)) * c(gap_extend),
                  l0=lane == c(0),
                  jv=(lane >= c(1)) & (lane <= qlen))
        sv.update(state)
        return sv

    # Head fill for the shifted query: a value no ref char equals
    # makes lane 0 an automatic mismatch, so m_new[0] =
    # max(0 + mismatch, 0) = 0 with no explicit lane-0 mask (one
    # select saved per row).  Only valid when mismatch <= 0.
    q_fill = -1 if mismatch <= 0 else 0

    def init_state(q):
        """Initial DP state (DP row 0) for a raw [H, TJP] query block;
        returned in scratch-write order (see _state_keys)."""
        H = q.shape[0]
        z = jnp.zeros((H, TJP), sdt)
        st = dict(m=z, i=jnp.full((H, TJP), neg_inf, sdt),
                  qs=shift_right(q.astype(sdt), 1, q_fill),
                  bh=jnp.full((H, TJP), -1, sdt), bi=z, ph=z,
                  # max(m, i, d) of DP row 0 = max(0, -inf, -inf) = 0.
                  p3=z)
        zi = jnp.zeros((H, TJP), jnp.int32)
        if n_hist >= 1:
            st["tp"] = zi
        if n_hist > 1:
            st.update(c1a=zi, c1b=zi, c1c=zi)
        return st

    go_minus_ge_v = gap_open - gap_extend

    def row_update(sv, i, rc):
        """Advance one DP row (i is the 0-based row scalar; DP row is
        i+1); rc = this row's ref char broadcast to [H, TJP].  Mutates
        sv, returns the dir row to store."""
        ip1 = jax.lax.convert_element_type(i + 1, sdt)
        is_eq = sv["qs"] == rc
        match_s = jnp.where(is_eq, c(match), c(mismatch))

        m_new = jnp.maximum(shift_right(sv["p3"], 1, 0) + match_s,
                            c(0))
        if mismatch > 0:
            # q_fill can't force lane 0 to zero; mask explicitly.
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
        # one lane, so compare unshifted and shift the flag value
        # itself — saves a full-width shift+add pair AND the
        # bool-cast/compare round trip (the flag is added to op
        # directly below).  Head lane: d is -inf, open wins, so
        # fill with the flag.
        fd_u = jnp.where(m_new + c(go_minus_ge_v) >= d_new,
                         c(GAP_OPEN_FLAG_D), c(0))
        fd_s = shift_right(fd_u, 1, GAP_OPEN_FLAG_D)

        # Tie order m > i > d (align.cpp:169-171): m == mx3 iff
        # m >= i and m >= d; else i == mx3 iff i >= d.  Two compares
        # against the already-computed max instead of three pairwise.
        op = jnp.where(m_new == mx3, c(3),
                       jnp.where(i_new == mx3, c(2), c(1)))
        # h == 0 iff max(m, i, d) <= 0: the reference ZERO rule.
        op = jnp.where(h == c(0), c(0), op)
        op = op + jnp.where(ins_open >= ins_ext,
                            c(GAP_OPEN_FLAG_I), c(0))
        op = op + fd_s
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

    def finalize(best_h, best_i, pos_h, qlen):
        """Per-stream block reduction -> (score, i, j, pos_score),
        each [H, 1] int32.  Among max cells, the reference keeps the
        row-major-last: largest i, then largest j (align.cpp:173,
        also the CUDA rule cuda_header.h:202-222)."""
        lane32 = jax.lax.broadcasted_iota(jnp.int32, best_h.shape, 1)
        bh32 = best_h.astype(jnp.int32)
        bi32 = best_i.astype(jnp.int32)
        ql32 = qlen.astype(jnp.int32)
        jv = (lane32 >= 1) & (lane32 <= ql32)
        hv = jnp.where(jv, bh32, -1)
        gmax = jnp.max(hv, axis=1, keepdims=True)
        key = jnp.where(hv == gmax, bi32 * (T + 2) + lane32, -1)
        kmax = jnp.max(key, axis=1, keepdims=True)
        found = kmax >= 0
        pos = jnp.sum(jnp.where(lane32 == ql32,
                                pos_h.astype(jnp.int32), 0),
                      axis=1, keepdims=True)
        return (jnp.where(found, gmax, 0),
                jnp.where(found, kmax // (T + 2), 0),
                jnp.where(found, kmax % (T + 2), 0),
                pos)

    return make_sv, init_state, row_update, finalize


def _state_keys(fmt: str):
    keys = ["m", "i", "qs", "bh", "bi", "ph", "p3"]
    n_hist = _N_HIST[fmt]
    if n_hist >= 1:
        keys.append("tp")
    if n_hist > 1:
        keys += ["c1a", "c1b", "c1c"]
    return keys


def _make_kernel(T: int, TJP: int, match: int, mismatch: int,
                 gap_open: int, gap_extend: int, sdt, neg_inf: int,
                 fmt: str):
    n_row_blocks = T // ROWS_PER_STEP
    make_sv, init_state, row_update, finalize = _tile_math(
        T, TJP, match, mismatch, gap_open, gap_extend, sdt, neg_inf,
        fmt)
    keys = _state_keys(fmt)

    def kernel(refT_ref, query_ref, rlen_ref, qlen_ref,    # inputs
               dir_ref, stats_ref, *scratch):
        ib = pl.program_id(1)  # row block: DP rows ib*8+1 .. ib*8+8
        BB = scratch[0].shape[0]
        # 16-bit iota is unsupported in hardware; generate 32-bit, cast.
        lane = jax.lax.broadcasted_iota(jnp.int32, (BB, TJP),
                                        1).astype(sdt)

        @pl.when(ib == 0)
        def _init():
            st0 = init_state(query_ref[:])
            for k, ref in zip(keys, scratch):
                ref[:] = st0[k]

        rlen = rlen_ref[:].astype(sdt)      # [BB, 1]
        qlen = qlen_ref[:].astype(sdt)
        sv = make_sv(lane, scratch[2][:], rlen, qlen,
                     {k: ref[:] for k, ref in zip(keys, scratch)
                      if k != "qs"})

        # 8 ref chars for this row block: [8, BB] -> [BB, 8].
        rc8 = refT_ref[:].astype(sdt).T

        for r in range(ROWS_PER_STEP):
            rcb = jnp.broadcast_to(rc8[:, r: r + 1], (BB, TJP))
            dir_ref[:, r, :] = row_update(sv, ib * ROWS_PER_STEP + r,
                                          rcb)

        for k, ref in zip(keys, scratch):
            if k != "qs":  # the shifted query is written once at init
                ref[:] = sv[k]

        @pl.when(ib == n_row_blocks - 1)
        def _finalize():
            score, bi, bj, pos = finalize(sv["bh"], sv["bi"],
                                          sv["ph"], qlen)
            stats_ref[:, 0:1] = score
            stats_ref[:, 1:2] = bi
            stats_ref[:, 2:3] = bj
            stats_ref[:, 3:4] = pos

    return kernel


def _make_stream_kernel(T: int, TJP: int, match: int, mismatch: int,
                        gap_open: int, gap_extend: int, sdt,
                        neg_inf: int, fmt: str, IL: int):
    """ILP variant: IL independent batch streams, each with its own
    input refs and [H, TJP] scratch, their row updates emitted
    alternately so one stream's independent ops can fill the other's
    serial shift-max-scan latency (the CUDA kernel's register-blocking
    rationale, cuda_header.h:156-243).

    The ONLY constructs beyond the plain kernel's proven patterns are
    static leading-dim indexed stores (`dir_ref[si, :, r, :]`,
    `stats_ref[si, :, 0:1]`) into the stacked outputs — no ref or
    value is ever sliced to a sublane sub-range (the Mosaic hardware
    aborts documented in docs/ROADMAP.md).
    """
    n_row_blocks = T // ROWS_PER_STEP
    make_sv, init_state, row_update, finalize = _tile_math(
        T, TJP, match, mismatch, gap_open, gap_extend, sdt, neg_inf,
        fmt)
    keys = _state_keys(fmt)
    nscr = len(keys)

    def kernel(*refs):
        ins = refs[: 4 * IL]
        dir_ref, stats_ref = refs[4 * IL], refs[4 * IL + 1]
        scratch = refs[4 * IL + 2:]
        ib = pl.program_id(1)
        H = scratch[0].shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (H, TJP),
                                        1).astype(sdt)

        streams = []
        for si in range(IL):
            refT_r, query_r, rlen_r, qlen_r = ins[4 * si: 4 * si + 4]
            scr = scratch[nscr * si: nscr * (si + 1)]

            @pl.when(ib == 0)
            def _init(query_r=query_r, scr=scr):
                st0 = init_state(query_r[:])
                for k, ref in zip(keys, scr):
                    ref[:] = st0[k]

            qlen = qlen_r[:].astype(sdt)
            sv = make_sv(lane, scr[2][:], rlen_r[:].astype(sdt), qlen,
                         {k: ref[:] for k, ref in zip(keys, scr)
                          if k != "qs"})
            streams.append((sv, refT_r[:].astype(sdt).T, qlen, scr))

        for r in range(ROWS_PER_STEP):
            # Alternate the streams' row updates; Mosaic's scheduler
            # sees IL independent dependency chains side by side.
            for si, (sv, rc8, _, _) in enumerate(streams):
                rcb = jnp.broadcast_to(rc8[:, r: r + 1], (H, TJP))
                dir_ref[si, :, r, :] = row_update(
                    sv, ib * ROWS_PER_STEP + r, rcb)

        for sv, _, _, scr in streams:
            for k, ref in zip(keys, scr):
                if k != "qs":
                    ref[:] = sv[k]

        @pl.when(ib == n_row_blocks - 1)
        def _finalize():
            for si, (sv, _, qlen, _) in enumerate(streams):
                score, bi, bj, pos = finalize(sv["bh"], sv["bi"],
                                              sv["ph"], qlen)
                stats_ref[si, :, 0:1] = score
                stats_ref[si, :, 1:2] = bi
                stats_ref[si, :, 2:3] = bj
                stats_ref[si, :, 3:4] = pos

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

    interleave=N>1 runs N independent batch streams of block_b/N rows
    each per grid step (batch rows are split into N contiguous spans);
    results are bit-identical for any value.
    """
    B, T = ref.shape
    BB = min(block_b, B)
    assert B % BB == 0, (B, BB)
    assert T % ROWS_PER_STEP == 0, T
    if not interpret and BB != B and BB % 128 != 0:
        # Mosaic hardware lowering requires the last block dim be a
        # multiple of 128 or equal to the full array dim (interpret
        # mode accepts anything); fail here with the geometry instead
        # of deep inside pallas_call.  Production always uses
        # min(128, B), which satisfies this by construction.
        raise ValueError(
            f"block_b={BB} with B={B}: TPU lowering needs block_b % "
            f"128 == 0 or block_b == B")
    assert dir_format in ("bytes", "packed", "packed6"), dir_format
    packed = dir_format != "bytes"
    TJP = _round_up(T + 1, 128)
    sdt_np, neg_inf = _score_dtype(T, match, mismatch, gap_open,
                                   gap_extend)

    refT = ref.T  # [T, B]: row block i loads its 8 chars as [8, BB]
    queryp = jnp.pad(query, ((0, 0), (0, TJP - T)),
                     constant_values=PAD_QUERY)
    rlen = ref_len.astype(jnp.int32).reshape(B, 1)
    qlen = query_len.astype(jnp.int32).reshape(B, 1)
    dir_dt = jnp.int32 if packed else jnp.uint8
    n_hist = _N_HIST[dir_format]
    compiler_params = pltpu.CompilerParams(
        # The unrolled 8-row body keeps several [BB, TJP]
        # temporaries live; allow Mosaic more scoped VMEM than the
        # 16M default (v5e has 128M physical VMEM).
        vmem_limit_bytes=100 * 1024 * 1024,
    )

    if interleave > 1:
        IL = interleave
        H = BB // IL  # per-stream rows per grid step
        S = B // IL   # per-stream batch span (contiguous)
        # Streams must stay sublane-aligned (8 int32 sublanes/vreg).
        assert B % IL == 0 and H % 8 == 0 and S % H == 0, \
            (B, BB, IL)
        kernel = _make_stream_kernel(T, TJP, match, mismatch, gap_open,
                                     gap_extend, sdt_np, neg_inf,
                                     dir_format, IL)
        inputs, in_specs = [], []
        for si in range(IL):
            sl = slice(si * S, (si + 1) * S)
            inputs += [refT[:, sl], queryp[sl], rlen[sl], qlen[sl]]
            in_specs += [
                pl.BlockSpec((ROWS_PER_STEP, H), lambda b, i: (i, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, TJP), lambda b, i: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, 1), lambda b, i: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, 1), lambda b, i: (b, 0),
                             memory_space=pltpu.VMEM),
            ]
        scratch = []
        for _ in range(IL):
            scratch += [pltpu.VMEM((H, TJP), sdt_np)
                        for _ in range(_N_STATE)]
            scratch += [pltpu.VMEM((H, TJP), jnp.int32)
                        for _ in range(n_hist)]
        dirm, stats = pl.pallas_call(
            kernel,
            grid=(S // H, T // ROWS_PER_STEP),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((IL, H, ROWS_PER_STEP, TJP),
                             lambda b, i: (0, b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((IL, H, 4), lambda b, i: (0, b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((IL, S, T, TJP), dir_dt),
                jax.ShapeDtypeStruct((IL, S, 4), jnp.int32),
            ],
            scratch_shapes=scratch,
            compiler_params=compiler_params,
            interpret=interpret,
        )(*inputs)
        # Streams are contiguous batch spans, so the stacked outputs
        # reshape to natural order for free (no data movement).
        dirm = dirm.reshape(B, T, TJP)
        stats = stats.reshape(B, 4)
    else:
        kernel = _make_kernel(T, TJP, match, mismatch, gap_open,
                              gap_extend, sdt_np, neg_inf, dir_format)
        scratch = [pltpu.VMEM((BB, TJP), sdt_np)
                   for _ in range(_N_STATE)]
        scratch += [pltpu.VMEM((BB, TJP), jnp.int32)
                    for _ in range(n_hist)]
        dirm, stats = pl.pallas_call(
            kernel,
            grid=(B // BB, T // ROWS_PER_STEP),
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
                jax.ShapeDtypeStruct((B, T, TJP), dir_dt),
                jax.ShapeDtypeStruct((B, 4), jnp.int32),
            ],
            scratch_shapes=scratch,
            compiler_params=compiler_params,
            interpret=interpret,
        )(refT, queryp, rlen, qlen)

    out = dict(max_score=stats[:, 0], max_i=stats[:, 1],
               max_j=stats[:, 2], pos_score=stats[:, 3])
    out["dir_words" if packed else "dir"] = dirm
    return out
