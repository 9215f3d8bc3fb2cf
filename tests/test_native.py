"""Parity tests: native C++ host runtime vs the Python executable spec.

Every native entry point (minimizer scan, seed-table build, D-SOFT
batch, FASTA loader) must be bit-exact against the pure
Python/NumPy implementations, which are themselves parity-tested
against the reference binary elsewhere.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from darwin_tpu import native
from darwin_tpu.coding import query_minimizers, ref_minimizers
from darwin_tpu.config import Params
from darwin_tpu.dsoft import dsoft
from darwin_tpu.engine.seqbank import SeqBank
from darwin_tpu.golden.dsoft import GoldenSeedTable, dsoft_scalar
from darwin_tpu.index.genome import Genome
from darwin_tpu.index.seed_table import SeedTable
from darwin_tpu.io.fasta import FastaRecord, parse_fasta

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")

ALPHA = np.frombuffer(b"ACGTN", dtype=np.uint8)


def random_seq(rng, n, n_frac=0.02, lower_frac=0.0):
    p = [(1 - n_frac) / 4] * 4 + [n_frac]
    seq = rng.choice(ALPHA, size=n, p=p).astype(np.uint8)
    if lower_frac:
        low = rng.random(n) < lower_frac
        seq[low] = seq[low] + 32  # ASCII lowercase
    return seq


@pytest.mark.parametrize("k,w", [(14, 4), (12, 4), (10, 5), (5, 2)])
@pytest.mark.parametrize("n", [0, 10, 17, 100, 20000])
def test_minimizer_scan_parity(k, w, n):
    rng = np.random.default_rng(n * 31 + k)
    seq = random_seq(rng, n, lower_frac=0.05)
    py = ref_minimizers(seq, k, w)
    nat = native.scan_minimizers(seq, k, w, query_conv=False)
    np.testing.assert_array_equal(py, nat)

    p, m = query_minimizers(seq, k, w)
    qpy = (m.astype(np.uint64) << np.uint64(32)) | p.astype(np.uint64)
    qnat = native.scan_minimizers(seq, k, w, query_conv=True)
    np.testing.assert_array_equal(qpy, qnat)


def test_build_table_keys_matches_numpy_build():
    rng = np.random.default_rng(7)
    ref = random_seq(rng, 60000)
    keys = native.build_table_keys(ref, 13, 4)
    expect = np.sort(ref_minimizers(ref, 13, 4))
    np.testing.assert_array_equal(keys, expect)


def test_seed_table_build_uses_native(monkeypatch):
    rng = np.random.default_rng(8)
    ref = random_seq(rng, 30000)
    t_native = SeedTable.build(ref, 12, 32, 64, 4)
    monkeypatch.setattr(native, "available", lambda: False)
    t_py = SeedTable.build(ref, 12, 32, 64, 4)
    np.testing.assert_array_equal(t_native.hashes, t_py.hashes)
    np.testing.assert_array_equal(t_native.pos, t_py.pos)


def _mutated_reads(rng, ref, n_reads, err=0.1):
    reads = []
    for _ in range(n_reads):
        s = int(rng.integers(0, max(1, len(ref) - 3000)))
        length = int(rng.integers(500, 3000))
        r = ref[s:s + length].copy()
        mut = rng.random(len(r)) < err
        r[mut] = rng.choice(ALPHA[:4], size=int(mut.sum()))
        reads.append(r)
    return reads


@pytest.mark.parametrize("threshold,cap_seeds,cap_cand",
                         [(21, 800, 10**6), (15, 50, 10**6), (10, 800, 3)])
def test_dsoft_batch_vs_golden(threshold, cap_seeds, cap_cand):
    rng = np.random.default_rng(threshold * 101 + cap_seeds)
    ref = random_seq(rng, 40000, n_frac=0)
    gt = GoldenSeedTable(ref, 12, 32, 64, 4)
    reads = _mutated_reads(rng, ref, 16)
    bank = SeqBank(reads)
    counts, hits, offs = native.dsoft_batch(
        gt.hashes, gt.pos_table, gt.k, gt.w, gt.bin_size, gt.ref_size,
        gt.kmer_max_occurence, bank.flat, bank.starts, bank.lengths,
        np.arange(len(reads)), cap_seeds, threshold, cap_cand,
        num_threads=4)
    at = 0
    for i, r in enumerate(reads):
        gold = dsoft_scalar(gt, r, cap_seeds, threshold, cap_cand)
        got = list(zip(hits[at:at + counts[i]].tolist(),
                       offs[at:at + counts[i]].tolist()))
        at += counts[i]
        assert got == gold, f"read {i}"
    assert at == len(hits)


def test_dsoft_batch_vs_vectorized():
    rng = np.random.default_rng(5)
    ref = random_seq(rng, 50000, n_frac=0)
    table = SeedTable.build(ref, 13, 32, 64, 4)
    reads = _mutated_reads(rng, ref, 12)
    bank = SeqBank(reads)
    counts, hits, offs = native.dsoft_batch(
        table.hashes, table.pos, table.k, table.w, table.bin_size,
        table.ref_size, table.kmer_max_occurence, bank.flat, bank.starts,
        bank.lengths, np.arange(len(reads)), 800, 18, 10**6)
    at = 0
    for i, r in enumerate(reads):
        vhits, voffs = dsoft(table, r, 800, 18, 10**6)
        np.testing.assert_array_equal(hits[at:at + counts[i]], vhits)
        np.testing.assert_array_equal(offs[at:at + counts[i]], voffs)
        at += counts[i]


def test_collect_calls_native_matches_python(monkeypatch):
    from darwin_tpu.pipeline import collect_calls
    rng = np.random.default_rng(11)
    ref = random_seq(rng, 30000, n_frac=0)
    params = Params(seed_size=12, threshold=15)
    genome = Genome([FastaRecord(["ref"],
                                 ref.tobytes().decode("ascii"))],
                    params.bin_size)
    table = SeedTable.build(genome.concat, params.seed_size,
                            params.seed_occurence_multiple,
                            params.bin_size, params.window_size)
    bank = SeqBank(_mutated_reads(rng, ref, 10))
    calls_nat = collect_calls(table, genome, bank, params)
    monkeypatch.setattr(native, "available", lambda: False)
    calls_py = collect_calls(table, genome, bank, params)
    np.testing.assert_array_equal(calls_nat.ref_id, calls_py.ref_id)
    np.testing.assert_array_equal(calls_nat.query_id, calls_py.query_id)
    np.testing.assert_array_equal(calls_nat.ref_pos, calls_py.ref_pos)
    np.testing.assert_array_equal(calls_nat.query_pos, calls_py.query_pos)


def test_fasta_native_parity(tmp_path):
    f = tmp_path / "x.fasta"
    f.write_text(">r1 pbsim|ref|S1_1\nACGTACGTAC\nGTNNacgt\n\n"
                 ">r2|weird=desc 2\nAC\n>r3\nGGGG\n")
    nat = native.parse_fasta(f)
    pure = parse_fasta(f, native=False)
    assert [r.fields for r in nat] == [r.fields for r in pure]
    assert [r.seq for r in nat] == [r.seq for r in pure]


def test_fasta_native_crlf_and_error(tmp_path):
    f = tmp_path / "crlf.fasta"
    f.write_bytes(b">a b\r\nACGT\r\nTTTT\r\n>b\r\nGG\r\n")
    nat = native.parse_fasta(f)
    pure = parse_fasta(f, native=False)
    assert [(r.fields, r.seq) for r in nat] == [
        (r.fields, r.seq) for r in pure]

    bad = tmp_path / "bad.fasta"
    bad.write_text("ACGT\n>r1\nAC\n")
    assert native.parse_fasta(bad) is None  # falls back to pure parser
    with pytest.raises(ValueError):
        parse_fasta(bad)


def test_build_table_keys_parallel_scan_matches_numpy():
    """Refs above the parallel-scan threshold (64k positions) must be
    bit-exact with the sequential/NumPy formulation."""
    rng = np.random.default_rng(21)
    ref = random_seq(rng, 300_000, n_frac=0.01, lower_frac=0.02)
    for k, w in [(14, 4), (12, 3), (11, 5)]:
        keys = native.build_table_keys(ref, k, w, num_threads=7)
        expect = np.sort(ref_minimizers(ref, k, w))
        np.testing.assert_array_equal(keys, expect, err_msg=f"k={k} w={w}")
    # Degenerate: a constant reference (one giant min-run) stresses the
    # virtual-anchor every-w emissions across chunk boundaries.
    const = np.full(200_000, ord("A"), np.uint8)
    keys = native.build_table_keys(const, 12, 4, num_threads=5)
    expect = np.sort(ref_minimizers(const, 12, 4))
    np.testing.assert_array_equal(keys, expect)


def test_build_table_parallel_scan_w1_zero_hash_prefix():
    """w=1 + a zero-hash seed at position 0: the sequential rule never
    emits at p=0 (last_p=0, needs p-last_p >= w), so the parallel scan's
    virtual run must start at p=w, not 0."""
    from darwin_tpu.coding.ntcoding import hash32

    k = 5
    mask = (1 << (2 * k)) - 1
    hashes = hash32(np.arange(mask + 1, dtype=np.uint32), k)
    zero_kmer = int(np.flatnonzero(hashes == 0)[0])
    # 2-bit decode, low bits first (GetSeedAtPos convention).
    prefix = np.array([ord("ACGT"[(zero_kmer >> (2 * i)) & 3])
                       for i in range(k)], np.uint8)
    rng = np.random.default_rng(99)
    body = random_seq(rng, 100_000, n_frac=0.0)
    seq = np.concatenate([prefix, body])
    for w in (1, 2):
        keys = native.build_table_keys(seq, k, w, num_threads=6)
        expect = np.sort(ref_minimizers(seq, k, w))
        np.testing.assert_array_equal(keys, expect, err_msg=f"w={w}")


@pytest.mark.slow
def test_native_stress_determinism():
    """Concurrency stress driver: table build + D-SOFT batch must be
    bit-deterministic across thread counts (make tsan runs the same
    binary under ThreadSanitizer)."""
    import subprocess
    root = Path(__file__).resolve().parent.parent / "darwin_tpu/native"
    r = subprocess.run(["make", "-C", str(root), "stress"],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "STRESS OK" in r.stdout
