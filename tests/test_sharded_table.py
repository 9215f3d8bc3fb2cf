"""Table-sharded D-SOFT (cross-device hit exchange) parity vs the
golden scalar spec, on the 8-device virtual mesh."""

from __future__ import annotations

import jax
import numpy as np
import pytest

from darwin_tpu.dsoft.device import pad_reads
from darwin_tpu.dsoft.sharded_table import (dsoft_table_sharded_fn,
                                            make_sharded_dense_index,
                                            make_sharded_table)
from darwin_tpu.engine.seqbank import SeqBank
from darwin_tpu.golden.dsoft import GoldenSeedTable, dsoft_scalar
from darwin_tpu.parallel.mesh import make_mesh

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _fixture(seed, n_reads=16, ref_len=40000, err=0.12,
             repetitive=False):
    rng = np.random.default_rng(seed)
    if repetitive:
        # Tandem-repeat-rich reference: many multi-hit minimizers, so
        # single bins receive several hits of one minimizer — stresses
        # the (m_pos, hit) tuple ordering across shards.
        unit = rng.choice(ALPHA, size=500).astype(np.uint8)
        ref = np.tile(unit, ref_len // 500 + 1)[:ref_len].copy()
        jitter = rng.random(ref_len) < 0.02
        ref[jitter] = rng.choice(ALPHA, size=int(jitter.sum()))
    else:
        ref = rng.choice(ALPHA, size=ref_len).astype(np.uint8)
    gt = GoldenSeedTable(ref, 12, 32, 64, 4)
    reads = []
    for _ in range(n_reads):
        s = int(rng.integers(0, max(1, ref_len - 3000)))
        r = ref[s:s + int(rng.integers(500, 2500))].copy()
        mut = rng.random(len(r)) < err
        r[mut] = rng.choice(ALPHA, size=int(mut.sum()))
        reads.append(r)
    return gt, reads


def _run(gt, reads, threshold, cap_seeds=800, cap_cand=10**6,
         tup_max=4096, cand_max=128):
    mesh = make_mesh(8)
    hs, ps = make_sharded_table(gt.hashes, gt.pos_table, 8)
    fn = dsoft_table_sharded_fn(
        mesh, k=gt.k, w=gt.w, bin_size=gt.bin_size,
        kmer_max_occ=gt.kmer_max_occurence, num_seeds_cap=cap_seeds,
        threshold=threshold, max_candidates=cap_cand, tup_max=tup_max,
        cand_max=cand_max)
    bank = SeqBank(reads)
    Q, lens = pad_reads(bank, range(len(reads)))
    return jax.device_get(fn(Q, lens, hs, ps))


def _check(gt, reads, out, threshold, cap_seeds=800, cap_cand=10**6):
    hits, offs, counts, over = out
    for i, r in enumerate(reads):
        assert not over[i], f"read {i} overflowed"
        gold = dsoft_scalar(gt, r, cap_seeds, threshold, cap_cand)
        got = list(zip(hits[i, :counts[i]].tolist(),
                       offs[i, :counts[i]].tolist()))
        assert got == gold, f"read {i}: {len(got)} vs {len(gold)}"


@pytest.mark.parametrize("seed,threshold", [(17, 15), (23, 10)])
def test_sharded_table_matches_golden(seed, threshold):
    gt, reads = _fixture(seed)
    out = _run(gt, reads, threshold)
    _check(gt, reads, out, threshold)


def test_sharded_table_repetitive_reference():
    gt, reads = _fixture(31, repetitive=True, err=0.05)
    out = _run(gt, reads, threshold=12, tup_max=16384, cand_max=512)
    _check(gt, reads, out, threshold=12)


def test_sharded_table_caps():
    gt, reads = _fixture(41)
    out = _run(gt, reads, threshold=10, cap_seeds=60, cap_cand=3)
    _check(gt, reads, out, threshold=10, cap_seeds=60, cap_cand=3)


def test_sharded_table_overflow_flagged():
    gt, reads = _fixture(47, repetitive=True, err=0.02)
    hits, offs, counts, over = _run(gt, reads, threshold=10, tup_max=64)
    assert over.any()


@pytest.mark.parametrize("seed,threshold,repetitive",
                         [(17, 15, False), (23, 10, False),
                          (31, 12, True)])
def test_sharded_table_dense_index_matches_golden(seed, threshold,
                                                  repetitive):
    """index="dense" (per-shard sub-range CSR gathers) must be
    record-identical to the searchsorted path and to the golden spec."""
    gt, reads = _fixture(seed, repetitive=repetitive,
                         err=0.05 if repetitive else 0.12)
    mesh = make_mesh(8)
    hs, ps = make_sharded_table(gt.hashes, gt.pos_table, 8)
    di = make_sharded_dense_index(hs)
    tup_max = 16384 if repetitive else 4096
    cand_max = 512 if repetitive else 128
    fn = dsoft_table_sharded_fn(
        mesh, k=gt.k, w=gt.w, bin_size=gt.bin_size,
        kmer_max_occ=gt.kmer_max_occurence, num_seeds_cap=800,
        threshold=threshold, max_candidates=10**6, tup_max=tup_max,
        cand_max=cand_max, index="dense", dense_steps=di.steps)
    bank = SeqBank(reads)
    Q, lens = pad_reads(bank, range(len(reads)))
    out = jax.device_get(fn(Q, lens, hs, ps, di.hd, di.crs, di.bkt,
                            di.base, di.shift))
    _check(gt, reads, out, threshold)


def test_sharded_dense_index_structure():
    """The two-level index must reproduce the searchsorted pos-range
    for every table hash (via a host replay of the device probe), and
    report zero occurrence for absent hashes."""
    gt, _ = _fixture(53, n_reads=1)
    hs, ps = make_sharded_table(gt.hashes, gt.pos_table, 8)
    di = make_sharded_dense_index(hs)
    ND = di.hd.shape[1]
    NB = di.bkt.shape[1] - 1

    def probe(s, h):
        rel = int(h) - int(di.base[s])
        if rel < 0:
            return 0, 0
        b = rel >> int(di.shift[s])
        if b >= NB:
            return 0, 0
        lo, hi = int(di.bkt[s, b]), int(di.bkt[s, b + 1])
        for _ in range(di.steps):
            if lo < hi:
                mid = (lo + hi) // 2
                if di.hd[s, mid] < h:
                    lo = mid + 1
                else:
                    hi = mid
        assert lo == hi, "refine budget too small"
        if lo >= ND or di.hd[s, lo] != h:
            return 0, 0
        return int(di.crs[s, lo]), int(di.crs[s, lo + 1])

    for s in range(8):
        real = hs[s][hs[s] != 0xFFFFFFFF]
        n = len(real)
        for h in list(real[:50]) + [real[n // 2], real[-1]]:
            start, end = probe(s, int(h))
            assert start == np.searchsorted(real, h, side="left")
            assert end == np.searchsorted(real, h, side="right")
        # A hash between two entries (absent) must read occ 0.
        gaps = np.flatnonzero(np.diff(real.astype(np.int64)) > 1)
        if len(gaps):
            g = int(real[gaps[0]]) + 1
            s0, e0 = probe(s, g)
            assert s0 == e0
        # Another shard's hashes must read occ 0 here.
        other = hs[(s + 1) % 8]
        other = other[other != 0xFFFFFFFF]
        if len(other):
            s0, e0 = probe(s, int(other[0]))
            assert s0 == e0


def test_make_sharded_table_hash_aligned():
    gt, _ = _fixture(53, n_reads=1)
    hs, ps = make_sharded_table(gt.hashes, gt.pos_table, 8)
    # No hash value may span two shards.
    last_real = []
    first_real = []
    for s in range(8):
        real = hs[s][hs[s] != 0xFFFFFFFF]
        if len(real):
            last_real.append(real[-1])
            first_real.append(real[0])
    for a, b in zip(last_real[:-1], first_real[1:]):
        assert a < b
    # Every entry survives exactly once.
    all_h = np.concatenate([hs[s][hs[s] != 0xFFFFFFFF] for s in range(8)])
    np.testing.assert_array_equal(all_h, gt.hashes)


@pytest.mark.parametrize("seed,threshold", [(17, 15), (61, 10)])
def test_sharded_table_all_to_all_exchange(seed, threshold):
    """a2a routing must be record-identical to the all-gather exchange
    (and to the golden spec)."""
    gt, reads = _fixture(seed)
    mesh = make_mesh(8)
    hs, ps = make_sharded_table(gt.hashes, gt.pos_table, 8)
    fn = dsoft_table_sharded_fn(
        mesh, k=gt.k, w=gt.w, bin_size=gt.bin_size,
        kmer_max_occ=gt.kmer_max_occurence, num_seeds_cap=800,
        threshold=threshold, max_candidates=10**6, tup_max=4096,
        cand_max=128, a2a_cap=2048)
    bank = SeqBank(reads)
    Q, lens = pad_reads(bank, range(len(reads)))
    out = jax.device_get(fn(Q, lens, hs, ps))
    _check(gt, reads, out, threshold)


@pytest.mark.parametrize("exchange", ["all_to_all", "all_gather"])
def test_collect_calls_table_sharded_matches_host(exchange):
    """The pipeline-level table-sharded collector (derived budgets,
    a2a default) must produce exactly the host collector's anchors."""
    from darwin_tpu.config import Params
    from darwin_tpu.engine.seqbank import SeqBank
    from darwin_tpu.index.genome import Genome
    from darwin_tpu.index.seed_table import SeedTable
    from darwin_tpu.io.fasta import FastaRecord
    from darwin_tpu.pipeline import (_collect_calls_python,
                                     collect_calls_table_sharded)

    rng = np.random.default_rng(71)
    ref = rng.choice(ALPHA, size=60_000).astype(np.uint8)
    params = Params(seed_size=12, threshold=12)
    table = SeedTable.build(ref, params.seed_size,
                            params.seed_occurence_multiple,
                            params.bin_size, params.window_size)
    genome = Genome([FastaRecord(["g"], ref.tobytes().decode())],
                    params.bin_size)
    reads = []
    for _ in range(16):
        s = int(rng.integers(0, 55_000))
        r = ref[s:s + int(rng.integers(800, 2500))].copy()
        mut = rng.random(len(r)) < 0.1
        r[mut] = rng.choice(ALPHA, size=int(mut.sum()))
        reads.append(r)
    bank = SeqBank(reads)
    mesh = make_mesh(8)
    got = collect_calls_table_sharded(table, genome, bank, params,
                                      mesh, exchange=exchange)
    want = _collect_calls_python(table, genome, bank, params,
                                 range(len(reads)))
    assert len(got) == len(want) > 0
    for f in ("ref_id", "query_id", "ref_pos", "query_pos"):
        np.testing.assert_array_equal(getattr(got, f),
                                      getattr(want, f), err_msg=f)


def test_sharded_table_a2a_cap_overflow_flagged():
    gt, reads = _fixture(47, repetitive=True, err=0.02)
    mesh = make_mesh(8)
    hs, ps = make_sharded_table(gt.hashes, gt.pos_table, 8)
    fn = dsoft_table_sharded_fn(
        mesh, k=gt.k, w=gt.w, bin_size=gt.bin_size,
        kmer_max_occ=gt.kmer_max_occurence, num_seeds_cap=800,
        threshold=10, max_candidates=10**6, tup_max=16384,
        cand_max=256, a2a_cap=8)  # tiny per-destination budget
    bank = SeqBank(reads)
    Q, lens = pad_reads(bank, range(len(reads)))
    hits, offs, counts, over = jax.device_get(fn(Q, lens, hs, ps))
    assert over.any()


def test_sharded_table_positions_past_2_31():
    """Table positions above 2^31 (GRCh38-scale concats) survive the
    hit exchange: positions ride uint32 lanes end to end (the
    reference's own pos width), so both exchanges must reproduce the
    golden spec bit for bit on a table shifted past int32 range."""
    gt, reads = _fixture(37)
    shift = np.uint64(2_600_000_000)
    gt.pos_table = (gt.pos_table.astype(np.uint64)
                    + shift).astype(np.uint32)
    gt.ref_size += int(shift)
    out = _run(gt, reads, threshold=15)
    hits, _, counts, _ = out
    real = np.concatenate([hits[i, :counts[i]]
                           for i in range(len(reads))])
    assert hits.dtype == np.uint32
    assert (real.astype(np.uint64) > np.uint64(2**31)).any()
    _check(gt, reads, out, threshold=15)
    # Same table through the all_to_all route (uint32 routing buffers).
    mesh = make_mesh(8)
    hs, ps = make_sharded_table(gt.hashes, gt.pos_table, 8)
    fn = dsoft_table_sharded_fn(
        mesh, k=gt.k, w=gt.w, bin_size=gt.bin_size,
        kmer_max_occ=gt.kmer_max_occurence, num_seeds_cap=800,
        threshold=15, max_candidates=10**6, tup_max=4096,
        cand_max=128, a2a_cap=1024)
    bank = SeqBank(reads)
    Q, lens = pad_reads(bank, range(len(reads)))
    out2 = jax.device_get(fn(Q, lens, hs, ps))
    _check(gt, reads, out2, threshold=15)
