"""Randomized cross-engine fuzz: production pipeline vs the golden
scalar spec on random small instances with randomized parameters.

The fixture suite pins specific oracle outputs; this fuzz sweeps the
parameter space (scoring, tile geometry, D-SOFT knobs, error rates,
N bases, revcomp) and requires the production engines to reproduce the
executable spec record-for-record on every draw."""

from __future__ import annotations

import numpy as np
import pytest

from darwin_tpu.config import Params
from darwin_tpu.golden.pipeline import golden_pipeline
from darwin_tpu.io.fasta import FastaRecord
from darwin_tpu.pipeline import run_pipeline

ALPHA = np.frombuffer(b"ACGTN", dtype=np.uint8)


def _instance(seed):
    rng = np.random.default_rng(seed)
    params = Params(
        match=int(rng.integers(1, 4)),
        mismatch=-int(rng.integers(1, 5)),
        gap_open=-int(rng.integers(1, 6)),
        gap_extend=-int(rng.integers(1, 4)),
        seed_size=int(rng.choice([11, 12, 13])),
        bin_size=int(rng.choice([32, 64, 128])),
        window_size=int(rng.choice([3, 4, 5])),
        threshold=int(rng.integers(11, 20)),
        num_seeds=int(rng.choice([50, 300, 800])),
        first_tile_score_threshold=int(rng.integers(5, 30)),
        tile_size=int(rng.choice([48, 64, 96])),
        tile_overlap=int(rng.choice([16, 24, 32])),
    )
    glen = int(rng.integers(4000, 12000))
    n_frac = float(rng.choice([0.0, 0.02]))
    p = [(1 - n_frac) / 4] * 4 + [n_frac]
    genome = rng.choice(ALPHA, size=glen, p=p).astype(np.uint8)
    reads = []
    n_reads = int(rng.integers(4, 9))
    for i in range(n_reads):
        s = int(rng.integers(0, max(1, glen - 1500)))
        length = int(rng.integers(300, 1500))
        r = genome[s:s + length].copy()
        err = float(rng.choice([0.0, 0.05, 0.12]))
        mut = rng.random(len(r)) < err
        r[mut] = rng.choice(ALPHA[:4], size=int(mut.sum()))
        if rng.random() < 0.3:
            comp = {65: 84, 84: 65, 67: 71, 71: 67, 78: 78}
            r = np.array([comp[c] for c in r[::-1]], dtype=np.uint8)
        reads.append(FastaRecord([f"R{i}_{s}_{len(r)}"],
                                 r.tobytes().decode()))
    return params, reads


@pytest.mark.slow
@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505])
def test_pipeline_fuzz_matches_golden_spec(seed):
    params, reads = _instance(seed)
    want = set(golden_pipeline(reads, reads, params, same_file=True))
    got = run_pipeline(reads, reads, params, same_file=True,
                       batch_size=int(np.random.default_rng(
                           seed).choice([8, 32, 64])))
    assert set(got.records) == want, (
        f"seed {seed}: params {params} "
        f"missing={sorted(want - set(got.records))[:3]} "
        f"extra={sorted(set(got.records) - want)[:3]}")


def _guided_instance(seed):
    rng = np.random.default_rng(seed)
    params, _ = _instance(seed)  # reuse the randomized parameter draw
    n_chrom = int(rng.integers(1, 4))
    chroms = []
    for c in range(n_chrom):
        glen = int(rng.integers(2000, 8000))
        seq = rng.choice(ALPHA[:4], size=glen).astype(np.uint8)
        chroms.append(FastaRecord([f"chr{c}"],
                                  seq.tobytes().decode()))
    reads = []
    for i in range(int(rng.integers(3, 7))):
        src = chroms[int(rng.integers(0, n_chrom))]
        g = np.frombuffer(src.seq.encode(), dtype=np.uint8)
        s = int(rng.integers(0, max(1, len(g) - 1200)))
        r = g[s:s + int(rng.integers(400, 1200))].copy()
        mut = rng.random(len(r)) < float(rng.choice([0.0, 0.08]))
        r[mut] = rng.choice(ALPHA[:4], size=int(mut.sum()))
        if rng.random() < 0.4:
            comp = {65: 84, 84: 65, 67: 71, 71: 67, 78: 78}
            r = np.array([comp[c] for c in r[::-1]], dtype=np.uint8)
        reads.append(FastaRecord([f"Q{i}"], r.tobytes().decode()))
    return params, chroms, reads


@pytest.mark.slow
@pytest.mark.parametrize("seed", [606, 707, 808])
def test_pipeline_fuzz_guided_matches_golden_spec(seed):
    params, chroms, reads = _guided_instance(seed)
    want = set(golden_pipeline(chroms, reads, params, same_file=False))
    got = run_pipeline(chroms, reads, params, same_file=False,
                       batch_size=16)
    assert set(got.records) == want, f"seed {seed}: params {params}"


@pytest.mark.parametrize("seed", [7032])
def test_pipeline_fuzz_regression_seeds(seed):
    """Seeds that exposed real bugs (7032: k+w<16 lets the reference-
    convention scan emit table positions past the reference end — the
    reference binary's bin decode is out-of-bounds UB there; we drop
    such positions at table build)."""
    params, reads = _instance(seed)
    want = set(golden_pipeline(reads, reads, params, same_file=True))
    got = run_pipeline(reads, reads, params, same_file=True,
                       batch_size=16)
    assert set(got.records) == want
