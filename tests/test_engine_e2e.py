"""End-to-end differential tests: production pipeline vs the reference
binary's golden outputs, on all fixtures."""

import pytest

from darwin_tpu.config import Params
from darwin_tpu.io.fasta import parse_fasta
from darwin_tpu.pipeline import run_pipeline


@pytest.mark.parametrize("fixture,batch", [("tiny", 32), ("tiny", 1),
                                           ("small", 128), ("noisy", 64),
                                           ("nbase", 64), ("lcase", 64),
                                           ("hierror", 64),
                                           ("seedcap", 64),
                                           ("tpucfg", 64)])
@pytest.mark.slow
def test_pipeline_matches_reference(data_dir, fixture, batch):
    d = data_dir / fixture
    params = Params.from_cfg(d / "params.cfg")
    reads = parse_fasta(d / "reads.fasta")
    result = run_pipeline(reads, reads, params, same_file=True,
                          batch_size=batch)
    want = set((d / "out.darwin").read_text().splitlines())
    got = set(result.records)
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}")


@pytest.mark.parametrize("batch", [64, 16])
@pytest.mark.slow
def test_pipeline_guided_mode_matches_reference(data_dir, batch):
    """Separate-file mode: mixed-length reads vs a multi-chromosome
    reference with non-bin-multiple piece lengths (stresses N padding,
    bin/chr decode maps, same_file=False record gating)."""
    d = data_dir / "guided"
    params = Params.from_cfg(d / "params.cfg")
    ref = parse_fasta(d / "ref.fasta")
    reads = parse_fasta(d / "reads.fasta")
    result = run_pipeline(ref, reads, params, same_file=False,
                          batch_size=batch)
    want = set((d / "out.darwin").read_text().splitlines())
    got = set(result.records)
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}")


@pytest.mark.parametrize("batch", [128])
@pytest.mark.slow
def test_pipeline_twofile_denovo_matches_reference(data_dir, batch):
    """Two-file de-novo mode at scale (ref != reads, same_file=False):
    two independent noisy read sets from one genome (the reference
    generateperfect.py:75-106 dataset shape), 20x8 kb vs 20x8 kb with
    reverse-complements, default params."""
    d = data_dir / "twofile"
    params = Params.from_cfg(d / "params.cfg")
    ref = parse_fasta(d / "ref.fasta")
    reads = parse_fasta(d / "reads.fasta")
    result = run_pipeline(ref, reads, params, same_file=False,
                          batch_size=batch)
    want = set((d / "out.darwin").read_text().splitlines())
    got = set(result.records)
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}")


@pytest.mark.slow
def test_pipeline_nondefault_scoring_matches_reference(data_dir):
    """match=2 mismatch=-3 gap_open=-4 gap_extend=-2: different op/flag
    tie paths, rescore junction correction, sentinel headroom."""
    d = data_dir / "scoring"
    params = Params.from_cfg(d / "params.cfg")
    assert (params.match, params.mismatch, params.gap_open,
            params.gap_extend) == (2, -3, -4, -2)
    reads = parse_fasta(d / "reads.fasta")
    result = run_pipeline(reads, reads, params, same_file=True,
                          batch_size=64)
    want = set((d / "out.darwin").read_text().splitlines())
    assert set(result.records) == want


@pytest.mark.slow
def test_pipeline_nondefault_dsoft_params_matches_reference(data_dir):
    """k=12, w=3, bin=128, threshold=15, num_seeds=300: different
    minimizer scan ranges, table geometry, bin mapping, and seed caps
    against the reference binary's output."""
    d = data_dir / "dsoftp"
    params = Params.from_cfg(d / "params.cfg")
    assert (params.seed_size, params.bin_size, params.window_size,
            params.threshold, params.num_seeds) == (12, 128, 3, 15, 300)
    reads = parse_fasta(d / "reads.fasta")
    result = run_pipeline(reads, reads, params, same_file=True,
                          batch_size=64)
    want = set((d / "out.darwin").read_text().splitlines())
    assert set(result.records) == want


@pytest.mark.parametrize("engine", ["host", "device"])
def test_pipeline_edge_inputs(engine):
    """Degenerate inputs: reads shorter than k+w, single read, and a
    read of all Ns must run clean and emit nothing spurious."""
    from darwin_tpu.io.fasta import FastaRecord
    params = Params(tile_size=64, tile_overlap=24)
    ref = FastaRecord(["tiny_ref"], "ACGTACGTAA" * 30)
    reads = [FastaRecord(["short"], "ACGT"),          # < k
             FastaRecord(["allN"], "N" * 200),
             FastaRecord(["real"], "ACGTACGTAA" * 12)]
    res = run_pipeline([ref], reads, params, same_file=False,
                       batch_size=8, engine=engine)
    for r in res.records:
        assert "short" not in r and "allN" not in r


@pytest.mark.parametrize("engine", ["host", "device"])
def test_pipeline_degenerate_references(engine):
    """Empty and shorter-than-k references run clean, no records."""
    from darwin_tpu.io.fasta import FastaRecord
    params = Params(tile_size=64, tile_overlap=24)
    read = FastaRecord(["r"], "ACGT" * 100)
    for ref_seq in ("", "ACGTACGT"):
        res = run_pipeline([FastaRecord(["ref"], ref_seq)], [read],
                           params, same_file=False, batch_size=8,
                           engine=engine)
        assert res.records == []
