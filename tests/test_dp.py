"""Batched JAX tile DP + traceback vs the golden scalar aligner.

Random tiles of varying lengths (including edge lengths and high-repeat
alphabets that force gaps and ties) are aligned by both paths; the
score/max-cell/op-stream must agree element-for-element.
"""

import numpy as np
import pytest

from darwin_tpu.golden.align import align_with_bt
from darwin_tpu.ops import PAD_QUERY, PAD_REF, align_tiles_jax, traceback_jax

MATCH, MISMATCH, GO, GE = 1, -1, -1, -1


def make_batch(rng, B, T, minlen=1, alpha=b"ACGT"):
    """Random related tile pairs (mutated copies) to get realistic paths."""
    ref = np.full((B, T), PAD_REF, dtype=np.uint8)
    query = np.full((B, T), PAD_QUERY, dtype=np.uint8)
    rlen = rng.integers(minlen, T + 1, size=B)
    qlen = rng.integers(minlen, T + 1, size=B)
    ab = np.frombuffer(alpha, dtype=np.uint8)
    for b in range(B):
        r = ab[rng.integers(0, len(ab), size=rlen[b])]
        # query = mutated prefix of ref + random tail
        q = r[:qlen[b]].copy()
        nmut = rng.integers(0, max(1, len(q) // 4))
        if len(q) and nmut:
            pos = rng.integers(0, len(q), size=nmut)
            q[pos] = ab[rng.integers(0, len(ab), size=nmut)]
        if len(q) < qlen[b]:
            q = np.concatenate(
                [q, ab[rng.integers(0, len(ab), size=qlen[b] - len(q))]])
        ref[b, :rlen[b]] = r
        query[b, :qlen[b]] = q
    return ref, query, rlen.astype(np.int32), qlen.astype(np.int32)


def run_batch(ref, query, rlen, qlen, first, et):
    out = align_tiles_jax(ref, query, rlen, qlen, match=MATCH,
                          mismatch=MISMATCH, gap_open=GO, gap_extend=GE)
    ops, mb, i_steps, j_steps = traceback_jax(
        out["dir"], rlen, qlen, first, out["max_i"], out["max_j"],
        early_terminate=et)
    return out, np.asarray(ops), np.asarray(i_steps), np.asarray(j_steps)


@pytest.mark.parametrize("T,et,seed", [(32, 12, 0), (64, 24, 1),
                                       (64, 24, 2), (48, 48, 3)])
@pytest.mark.parametrize("first", [True, False])
def test_dp_matches_golden(T, et, seed, first):
    rng = np.random.default_rng(seed)
    B = 24
    alpha = b"ACGT" if seed % 2 == 0 else b"ACN"  # high-repeat + N case
    ref, query, rlen, qlen, = make_batch(rng, B, T, alpha=alpha)
    firsts = np.full(B, first)
    out, ops, i_steps, j_steps = run_batch(ref, query, rlen, qlen,
                                           firsts, et)
    for b in range(B):
        want = align_with_bt(ref[b, :rlen[b]], query[b, :qlen[b]],
                             MATCH, MISMATCH, GO, GE,
                             int(qlen[b]), int(rlen[b]),
                             False, first, et)
        if first:
            assert int(out["max_score"][b]) == want[0], b
            assert int(out["max_i"][b]) == want[1], b
            assert int(out["max_j"][b]) == want[2], b
            want_ops = want[3:]
        else:
            assert int(out["pos_score"][b]) == want[0], b
            want_ops = want[1:]
        got_ops = [int(o) for o in ops[:, b] if o != 0]
        assert got_ops == want_ops, b
        want_i = sum(1 for o in want_ops if o in (3, 2))
        want_j = sum(1 for o in want_ops if o in (3, 1))
        assert i_steps[b] == want_i and j_steps[b] == want_j, b


def test_dp_idle_slot():
    """Zero-length tiles (idle batch slots) produce no ops, score 0."""
    B, T = 4, 32
    ref = np.full((B, T), PAD_REF, dtype=np.uint8)
    query = np.full((B, T), PAD_QUERY, dtype=np.uint8)
    zl = np.zeros(B, dtype=np.int32)
    out, ops, i_steps, j_steps = run_batch(
        ref, query, zl, zl, np.zeros(B, bool), 12)
    assert (np.asarray(out["max_score"]) == 0).all()
    assert (ops == 0).all()
    assert (i_steps == 0).all() and (j_steps == 0).all()


def test_dp_reversed_tiles_equal_golden_reverse():
    """Engine-side reversal equals the reference's reverse=True read
    order: aligning reversed tiles forward is the same recurrence."""
    rng = np.random.default_rng(9)
    T, et = 40, 16
    ref, query, rlen, qlen = make_batch(rng, 8, T)
    rev_ref = np.full_like(ref, PAD_REF)
    rev_query = np.full_like(query, PAD_QUERY)
    for b in range(len(ref)):
        rev_ref[b, :rlen[b]] = ref[b, :rlen[b]][::-1]
        rev_query[b, :qlen[b]] = query[b, :qlen[b]][::-1]
    out, ops, _, _ = run_batch(rev_ref, rev_query, rlen, qlen,
                               np.zeros(len(ref), bool), et)
    for b in range(len(ref)):
        want = align_with_bt(ref[b, :rlen[b]], query[b, :qlen[b]],
                             MATCH, MISMATCH, GO, GE,
                             int(qlen[b]), int(rlen[b]),
                             True, False, et)
        got_ops = [int(o) for o in ops[:, b] if o != 0]
        assert int(out["pos_score"][b]) == want[0], b
        assert got_ops == want[1:], b
