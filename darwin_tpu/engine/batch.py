"""GACT batch engine: persistent-slot scheduler around the tile kernel.

Re-design of GACT_Batch (reference gact.cpp:231-560): BATCH_SIZE slots
each own one in-flight GACT call; every iteration prepares one tile per
slot, aligns the whole batch on device, and advances each call's state
machine (reverse extension -> forward extension -> emit + refill).

Parity choices (all mirroring the reference batch path, which agrees
with the scalar GACT path under valid configs):

* phase swap / emission / slot refill happen in the *prepare* step of
  the next iteration (gact.cpp:314-390);
* first tiles re-anchor to the max cell and gate on
  first_tile_score_threshold, skipping op application on failure
  (gact.cpp:449-463, 497-508);
* a tile with zero steps on either axis terminates the phase
  (gact.cpp:545);
* `first` stays set until some tile yields ops (gact.cpp:543).

Scoring is accumulated incrementally from op streams (see scoring.py)
instead of materializing aligned strings; the anchor-junction gap-run
correction is applied at emission.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from darwin_tpu.engine.scoring import ScoreParams, score_ops_batch
from darwin_tpu.engine.seqbank import SeqBank
from darwin_tpu.index.genome import Genome
from darwin_tpu.ops.common import PAD_QUERY, PAD_REF

SCORE_THRESHOLD = 0  # reference gact.cpp:24


@dataclasses.dataclass
class GactCalls:
    """Anchor set produced by D-SOFT (reference GACT_call, gact.h:35)."""
    ref_id: np.ndarray     # chromosome/piece id
    query_id: np.ndarray   # read id
    ref_pos: np.ndarray    # anchor, chromosome-local
    query_pos: np.ndarray

    def __len__(self) -> int:
        return len(self.ref_id)


@dataclasses.dataclass
class OverlapRecord:
    ref_id: int
    query_id: int
    ab: int
    ae: int
    bb: int
    be: int
    score: int
    comp: bool


def run_gact_batch(genome: Genome, queries: SeqBank, calls: GactCalls,
                   *, tile_size: int, first_tile_score_threshold: int,
                   sp: ScoreParams, complement: bool, same_file: bool,
                   aligner, batch_size: int,
                   compute_score: bool = True) -> list[OverlapRecord]:
    N = len(calls)
    records: list[OverlapRecord] = []
    if N == 0:
        return records

    B = batch_size
    T = tile_size
    g_piece_start = genome.chr_id_to_start_bin * genome.bin_size
    g_piece_len = genome.piece_lengths

    # Per-call state.
    ref_pos = calls.ref_pos.astype(np.int64).copy()
    query_pos = calls.query_pos.astype(np.int64).copy()
    ref_bpos = ref_pos.copy()
    query_bpos = query_pos.copy()
    first = np.ones(N, dtype=bool)
    reverse = np.ones(N, dtype=bool)
    score = np.zeros(N, dtype=np.int64)
    prev_gap = np.zeros(N, dtype=bool)
    has_phase_ops = np.zeros((2, N), dtype=bool)   # [left, right]
    phase_first_gap = np.zeros((2, N), dtype=bool)

    # Slot state.
    assign = np.full(B, -1, dtype=np.int64)
    ninit = min(B, N)
    assign[:ninit] = np.arange(ninit)
    terminate = np.zeros(B, dtype=bool)
    next_callidx = ninit
    calls_done = 0

    ref_tiles = np.empty((B, T), dtype=np.uint8)
    query_tiles = np.empty((B, T), dtype=np.uint8)
    ref_lens = np.empty(B, dtype=np.int64)
    query_lens = np.empty(B, dtype=np.int64)
    firsts_b = np.zeros(B, dtype=bool)
    rev_b = np.zeros(B, dtype=bool)

    def emit(ci: int) -> None:
        s = int(score[ci])
        if has_phase_ops[0, ci] and has_phase_ops[1, ci] \
                and phase_first_gap[0, ci] and phase_first_gap[1, ci]:
            # A gap run spans the anchor junction: both stream-initial
            # sub-runs were charged gap_open; the true merged run is
            # charged once (see scoring.py module docstring).
            s += sp.gap_extend - sp.gap_open
        rid, qid = int(calls.ref_id[ci]), int(calls.query_id[ci])
        keep = not (same_file and rid == qid)
        if compute_score:
            keep = keep and s > SCORE_THRESHOLD
        if keep:
            records.append(OverlapRecord(
                rid, qid, int(ref_bpos[ci]), int(ref_pos[ci]),
                int(query_bpos[ci]), int(query_pos[ci]),
                s if compute_score else 0, complement))

    while calls_done < N:
        # ---- prepare (gact.cpp:298-410) --------------------------------
        ref_lens.fill(-1)
        for t in range(B):
            ci = int(assign[t])
            if ci < 0:
                continue
            rid = calls.ref_id[ci]
            rlen_total = g_piece_len[rid]
            qlen_total = queries.lengths[calls.query_id[ci]]

            if reverse[ci]:
                if ref_pos[ci] <= 0 or query_pos[ci] <= 0 or terminate[t]:
                    # Reverse phase done: swap begin/current, go forward.
                    ref_bpos[ci], ref_pos[ci] = ref_pos[ci], ref_bpos[ci]
                    query_bpos[ci], query_pos[ci] = (query_pos[ci],
                                                     query_bpos[ci])
                    reverse[ci] = False
                    terminate[t] = False
                    prev_gap[ci] = False  # new op stream, open=True
            else:
                if ref_pos[ci] >= rlen_total \
                        or query_pos[ci] >= qlen_total or terminate[t]:
                    emit(ci)
                    calls_done += 1
                    if next_callidx >= N:
                        assign[t] = -1
                        continue
                    ci = next_callidx
                    next_callidx += 1
                    assign[t] = ci
                    terminate[t] = False
                    rid = calls.ref_id[ci]
                    rlen_total = g_piece_len[rid]
                    qlen_total = queries.lengths[calls.query_id[ci]]
                    if ref_pos[ci] <= 0 or query_pos[ci] <= 0:
                        reverse[ci] = False
                        ref_bpos[ci] = ref_pos[ci]
                        query_bpos[ci] = query_pos[ci]

            firsts_b[t] = first[ci]
            rev_b[t] = reverse[ci]
            gs = g_piece_start[rid]
            if reverse[ci]:
                rl = min(int(ref_pos[ci]), T)
                ql = min(int(query_pos[ci]), T)
                rt = genome.concat[gs + ref_pos[ci] - rl:
                                   gs + ref_pos[ci]]
                qt = queries.slice(calls.query_id[ci],
                                   int(query_pos[ci]) - ql, ql)
            else:
                rl = min(T, int(rlen_total - ref_pos[ci]))
                ql = min(T, int(qlen_total - query_pos[ci]))
                # Forward tiles are read back-to-front by the reference
                # kernel (align.cpp:130, reverse=true); we flip at slice
                # time instead, like the CUDA marshaling
                # (cuda_host.cu:113-142).
                rt = genome.concat[gs + ref_pos[ci]:
                                   gs + ref_pos[ci] + rl][::-1]
                qt = queries.slice(calls.query_id[ci],
                                   int(query_pos[ci]), ql)[::-1]
            ref_lens[t] = rl
            query_lens[t] = ql
            ref_tiles[t, :rl] = rt
            ref_tiles[t, rl:] = PAD_REF
            query_tiles[t, :ql] = qt
            query_tiles[t, ql:] = PAD_QUERY

        if calls_done >= N and not (assign >= 0).any():
            break

        # ---- device: DP + traceback ------------------------------------
        active = ref_lens >= 0
        res = aligner(ref_tiles, query_tiles,
                      np.maximum(ref_lens, 0), np.maximum(query_lens, 0),
                      firsts_b)

        # ---- postprocess (gact.cpp:427-550) -----------------------------
        # Pass 1: first-tile re-anchoring + threshold gate (scalar).
        apply_ops = active.copy()
        rp_t = np.zeros(B, dtype=np.int64)
        qp_t = np.zeros(B, dtype=np.int64)
        for t in range(B):
            ci = int(assign[t])
            if ci < 0:
                apply_ops[t] = False
                continue
            rp, qp = ref_pos[ci], query_pos[ci]
            if first[ci]:
                if rev_b[t]:
                    rp = rp - ref_lens[t] + int(res.max_i[t])
                    qp = qp - query_lens[t] + int(res.max_j[t])
                    ref_bpos[ci] = rp
                    query_bpos[ci] = qp
                else:
                    rp = rp + ref_lens[t] - int(res.max_i[t])
                    qp = qp + query_lens[t] - int(res.max_j[t])
                if int(res.score[t]) < first_tile_score_threshold:
                    terminate[t] = True
                    ref_pos[ci] = rp
                    query_pos[ci] = qp
                    apply_ops[t] = False
                    continue
            rp_t[t] = rp
            qp_t[t] = qp

        # Pass 2: vectorized scoring of the applied op streams.
        ops = res.ops.copy()
        ops[~apply_ops] = 0
        if compute_score:
            slot_ci = np.maximum(assign, 0)
            rid_b = calls.ref_id[slot_ci]
            qid_b = calls.query_id[slot_ci]
            gs_b = g_piece_start[rid_b]

            def ref_chars(idx):
                return genome.concat[np.clip(
                    gs_b[:, None] + idx, 0, len(genome.concat) - 1)]

            def query_chars(idx):
                return queries.gather(qid_b[:, None], idx)

            pg = prev_gap[slot_ci]
            delta, new_pg, first_gap = score_ops_batch(
                ops, ref_chars, query_chars, rp_t, qp_t, rev_b, pg, sp)

        has_ops = (ops != 0).any(axis=1)

        # Pass 3: state updates (scalar scatter; each call sits in at
        # most one slot).
        for t in range(B):
            ci = int(assign[t])
            if ci < 0 or not apply_ops[t]:
                continue
            j_steps = int(res.ref_steps[t])    # ref-axis chars consumed
            i_steps = int(res.query_steps[t])  # query-axis
            if compute_score:
                score[ci] += int(delta[t])
                prev_gap[ci] = bool(new_pg[t])
                phase = 0 if rev_b[t] else 1
                if has_ops[t] and not has_phase_ops[phase, ci]:
                    has_phase_ops[phase, ci] = True
                    phase_first_gap[phase, ci] = bool(first_gap[t])
            elif has_ops[t]:
                has_phase_ops[0 if rev_b[t] else 1, ci] = True
            if has_ops[t]:
                first[ci] = False
            if rev_b[t]:
                ref_pos[ci] = rp_t[t] - j_steps
                query_pos[ci] = qp_t[t] - i_steps
            else:
                ref_pos[ci] = rp_t[t] + j_steps
                query_pos[ci] = qp_t[t] + i_steps
            if i_steps == 0 or j_steps == 0:
                terminate[t] = True

    return records
