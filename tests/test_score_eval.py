"""Score-only SW op + NPBSS-style score evaluator + datagen modes."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from darwin_tpu.eval.datagen import (overlap_pairs, sample_reads,  # noqa: E402
                                     synth_genome, two_readsets)
from darwin_tpu.eval.score_eval import (evaluate_scores,  # noqa: E402
                                        theoretical_pairs)
from darwin_tpu.ops.reference_dp import align_tiles_jax  # noqa: E402
from darwin_tpu.ops.swscore import local_score_batch  # noqa: E402

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def test_local_score_matches_tile_dp_max():
    """On inputs that fit one tile, the score-only op must equal the
    tile DP's max score (same recurrence, same gap convention)."""
    rng = np.random.default_rng(5)
    B, T = 16, 48
    ref = ALPHA[rng.integers(0, 4, size=(B, T))]
    query = ref.copy()
    mut = rng.random((B, T)) < 0.2
    query[mut] = ALPHA[rng.integers(0, 4, size=int(mut.sum()))]
    rlen = rng.integers(1, T + 1, size=B).astype(np.int32)
    qlen = rng.integers(1, T + 1, size=B).astype(np.int32)
    for sc in [(1, -1, -1, -1), (2, -3, -4, -2)]:
        kw = dict(match=sc[0], mismatch=sc[1], gap_open=sc[2],
                  gap_extend=sc[3])
        want = align_tiles_jax(ref, query, rlen, qlen, **kw)["max_score"]
        got = local_score_batch(ref, query, rlen, qlen, **kw)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=str(sc))


def test_local_score_rectangular():
    """Non-square LR != LQ shapes and perfect-identity scores."""
    rng = np.random.default_rng(9)
    seq = ALPHA[rng.integers(0, 4, size=64)]
    ref = seq[None, :]
    query = seq[None, :40].copy()
    got = local_score_batch(ref, query, np.array([64], np.int32),
                            np.array([40], np.int32), match=1,
                            mismatch=-1, gap_open=-1, gap_extend=-1)
    assert int(got[0]) == 40  # exact prefix match


def test_overlap_pairs_exact_overlap():
    rng = np.random.default_rng(3)
    refs, reads = overlap_pairs(4, 200, 120, 160, rng)
    assert len(refs) == len(reads) == 4
    for (n1, s1), (n2, s2) in zip(refs, reads):
        i1 = [int(x) for x in n1[1:].split("_")]
        i2 = [int(x) for x in n2[1:].split("_")]
        ov = i1[1] + i1[2] - i2[1]  # coordinate overlap length
        assert 120 <= ov <= 160
        assert s1[-ov:] == s2[:ov]  # the shared sequence is exact
        assert len(s1) == i1[2] and len(s2) == i2[2]


def test_two_readsets_and_theoretical_pairs():
    rng = np.random.default_rng(11)
    genome = synth_genome(4000, rng)
    a, b = two_readsets(genome, 6, 1500, rng)
    pairs = theoretical_pairs([n for n, _ in a], [n for n, _ in b],
                              min_overlap=1000)
    # verify against brute-force membership test
    for (i, j) in pairs:
        pa = [int(x) for x in a[i][0][1:].split("_")[:2]][1]
        pb = [int(x) for x in b[j][0][1:].split("_")[:2]][1]
        assert min(pa + 1500, pb + 1500) - max(pa, pb) > 1000


def test_evaluate_scores_end_to_end():
    """Run the real pipeline on a tiny two-file dataset, then check the
    evaluator: every reported score must be <= the exact SW score, and
    matched/FN/FP bookkeeping must be self-consistent."""
    from darwin_tpu.config import Params
    from darwin_tpu.golden.gact import format_record
    from darwin_tpu.io.fasta import FastaRecord
    from darwin_tpu.pipeline import run_pipeline

    rng = np.random.default_rng(17)
    genome = synth_genome(9000, rng)
    a, b = two_readsets(genome, 5, 2500, rng, error_rate=0.05,
                        rc_fraction=0.5)
    params = Params(seed_size=12, tile_size=64, tile_overlap=24,
                    threshold=12, bin_size=32, window_size=4)
    ref_recs = [FastaRecord([n], s) for n, s in a]
    read_recs = [FastaRecord([n], s) for n, s in b]
    res = run_pipeline(ref_recs, read_recs, params, same_file=False,
                       batch_size=64, engine="host")
    records = sorted(set(res.records))
    out = evaluate_scores(records, [n for n, _ in a], [n for n, _ in b],
                          [s for _, s in a], [s for _, s in b],
                          min_overlap=1000)
    assert out.n_theoretical > 0
    assert out.higher_score == 0  # exact SW is an upper bound
    assert out.n_matched == out.same_score + out.lower_score
    assert out.fn <= out.n_theoretical
