"""Vectorized D-SOFT vs the golden scalar loop, on real fixture data."""

import numpy as np
import pytest

from darwin_tpu.config import Params
from darwin_tpu.dsoft import dsoft
from darwin_tpu.golden.dsoft import GoldenSeedTable, dsoft_scalar
from darwin_tpu.index.genome import Genome
from darwin_tpu.index.seed_table import SeedTable
from darwin_tpu.io.fasta import parse_fasta, revcomp


def build_tables(data_dir, name):
    d = data_dir / name
    params = Params.from_cfg(d / "params.cfg")
    reads = parse_fasta(d / "reads.fasta")
    genome = Genome(reads, params.bin_size)
    table = SeedTable.build(genome.concat, params.seed_size,
                            params.seed_occurence_multiple,
                            params.bin_size, params.window_size)
    gold = GoldenSeedTable(genome.concat, params.seed_size,
                           params.seed_occurence_multiple,
                           params.bin_size, params.window_size)
    return params, reads, table, gold


def test_table_matches_golden(data_dir):
    _, _, table, gold = build_tables(data_dir, "tiny")
    np.testing.assert_array_equal(table.hashes, gold.hashes)
    np.testing.assert_array_equal(table.pos, gold.pos_table)
    assert table.kmer_max_occurence == gold.kmer_max_occurence


@pytest.mark.parametrize("fixture", ["tiny", "noisy"])
def test_dsoft_matches_scalar(data_dir, fixture):
    params, reads, table, gold = build_tables(data_dir, fixture)
    for rec in reads[:10]:
        for seq in (rec.seq, revcomp(rec.seq)):
            want = dsoft_scalar(gold, seq, params.num_seeds,
                                params.threshold, params.max_candidates)
            hits, offsets = dsoft(table, seq, params.num_seeds,
                                  params.threshold, params.max_candidates)
            got = list(zip(hits.tolist(), offsets.tolist()))
            assert got == want


def test_dsoft_caps(data_dir):
    """num_seeds and max_candidates caps replicate the scalar loop."""
    params, reads, table, gold = build_tables(data_dir, "tiny")
    seq = reads[0].seq
    for cap in (0, 1, 5):
        want = dsoft_scalar(gold, seq, cap, params.threshold, 10**6)
        hits, offsets = dsoft(table, seq, cap, params.threshold, 10**6)
        assert list(zip(hits.tolist(), offsets.tolist())) == want
    for mc in (0, 1, 2):
        want = dsoft_scalar(gold, seq, params.num_seeds, params.threshold, mc)
        hits, offsets = dsoft(table, seq, params.num_seeds,
                              params.threshold, mc)
        assert len(hits) == len(want) <= mc


def test_dsoft_empty_query(data_dir):
    _, _, table, _ = build_tables(data_dir, "tiny")
    hits, offsets = dsoft(table, "ACGT", 800, 21, 10**6)
    assert len(hits) == 0
