"""PAF output: coordinate conversion, strand mapping, match counts."""

import numpy as np
import pytest

from darwin_tpu.config import Params
from darwin_tpu.engine.batch import OverlapRecord
from darwin_tpu.io.fasta import FastaRecord, parse_fasta
from darwin_tpu.io.paf import paf_line


def test_paf_line_strand_and_coords():
    r = OverlapRecord(0, 1, 100, 500, 10, 400, 333, False, nmatch=350)
    line = paf_line(r, "chr1", 1000, "read1", 450)
    cols = line.split("\t")
    assert cols[:12] == ["read1", "450", "10", "400", "+", "chr1",
                        "1000", "100", "500", "350", "400", "255"]
    assert cols[12] == "AS:i:333"
    # comp=1: query span maps back to the original strand.
    rc = OverlapRecord(0, 1, 100, 500, 10, 400, 333, True, nmatch=350)
    cols = paf_line(rc, "chr1", 1000, "read1", 450).split("\t")
    assert cols[2] == str(450 - 400) and cols[3] == str(450 - 10)
    assert cols[4] == "-"


def test_paf_line_exact_block_length():
    """With an op-stream tally (ncols), column 11 is exact — matches +
    mismatches + gap columns — not the span lower bound."""
    r = OverlapRecord(0, 1, 100, 500, 10, 400, 333, False,
                      nmatch=350, ncols=412)
    assert paf_line(r, "chr1", 1000, "read1", 450).split("\t")[10] \
        == "412"


def test_engine_ncols_vs_golden():
    """The engine's per-record column tally equals the number of ops
    the golden scalar pipeline emits for the same record."""
    from darwin_tpu.coding import seq_to_bytes
    from darwin_tpu.engine.aligner import JaxTileAligner
    from darwin_tpu.engine.batch import run_gact_batch
    from darwin_tpu.engine.scoring import ScoreParams
    from darwin_tpu.engine.seqbank import SeqBank
    from darwin_tpu.eval.datagen import sample_reads, synth_genome
    from darwin_tpu.index.genome import Genome
    from darwin_tpu.index.seed_table import SeedTable
    from darwin_tpu.pipeline import collect_calls

    rng = np.random.default_rng(11)
    genome_s = synth_genome(6_000, rng)
    reads = [FastaRecord([n], s) for n, s in
             sample_reads(genome_s, 6, 1_500, rng)]
    params = Params(seed_size=12, tile_size=64, tile_overlap=24,
                    threshold=12, bin_size=32)
    genome = Genome(reads, params.bin_size)
    table = SeedTable.build(genome.concat, params.seed_size,
                            params.seed_occurence_multiple,
                            params.bin_size, params.window_size)
    bank = SeqBank([seq_to_bytes(r.seq) for r in reads])
    calls = collect_calls(table, genome, bank, params)
    aligner = JaxTileAligner(
        tile_size=params.tile_size,
        early_terminate=params.early_terminate, match=params.match,
        mismatch=params.mismatch, gap_open=params.gap_open,
        gap_extend=params.gap_extend, backend="lax")
    recs = run_gact_batch(
        genome, bank, calls, tile_size=params.tile_size,
        first_tile_score_threshold=params.first_tile_score_threshold,
        sp=ScoreParams(params.match, params.mismatch, params.gap_open,
                       params.gap_extend),
        complement=False, same_file=True, aligner=aligner,
        batch_size=16)
    assert recs
    for rec in recs:
        # Sampled perfect reads: every walked column is an exact match,
        # so the tally equals nmatch.  Spans may exceed it: first-tile
        # re-anchoring moves the record start to the tile's max cell
        # without emitting ops (gact.cpp first-tile semantics), so the
        # op count is bounded by — not equal to — the larger span.
        assert rec.ncols == rec.nmatch > 0
        assert rec.ncols <= max(rec.ae - rec.ab, rec.be - rec.bb)


@pytest.mark.slow
def test_paf_from_pipeline_perfect_reads():
    """Perfect self-sampled reads: every PAF record must stay within
    sequence bounds and carry nmatch == aligned span (identity 100%)."""
    from darwin_tpu.eval.datagen import sample_reads, synth_genome
    from darwin_tpu.index.genome import Genome
    from darwin_tpu.io.paf import paf_lines
    from darwin_tpu.pipeline import run_pipeline

    rng = np.random.default_rng(4)
    genome_s = synth_genome(20_000, rng)
    reads = [FastaRecord([n], s) for n, s in
             sample_reads(genome_s, 8, 3_000, rng)]
    params = Params(seed_size=12, tile_size=64, tile_overlap=24,
                    threshold=12, bin_size=32)
    res = run_pipeline(reads, reads, params, same_file=True,
                       batch_size=64, engine="host")
    # run_pipeline returns formatted strings; go through the engine API
    # for structured records instead.
    from darwin_tpu.coding import seq_to_bytes
    from darwin_tpu.engine.scoring import ScoreParams
    from darwin_tpu.engine.seqbank import SeqBank
    from darwin_tpu.engine.batch import run_gact_batch
    from darwin_tpu.index.seed_table import SeedTable
    from darwin_tpu.engine.aligner import JaxTileAligner
    from darwin_tpu.pipeline import collect_calls

    genome = Genome(reads, params.bin_size)
    table = SeedTable.build(genome.concat, params.seed_size,
                            params.seed_occurence_multiple,
                            params.bin_size, params.window_size)
    bank = SeqBank([seq_to_bytes(r.seq) for r in reads])
    calls = collect_calls(table, genome, bank, params)
    aligner = JaxTileAligner(
        tile_size=params.tile_size,
        early_terminate=params.early_terminate, match=params.match,
        mismatch=params.mismatch, gap_open=params.gap_open,
        gap_extend=params.gap_extend, backend="lax")
    recs = run_gact_batch(
        genome, bank, calls, tile_size=params.tile_size,
        first_tile_score_threshold=params.first_tile_score_threshold,
        sp=ScoreParams(params.match, params.mismatch, params.gap_open,
                       params.gap_extend),
        complement=False, same_file=True, aligner=aligner,
        batch_size=64)
    assert recs
    lines = paf_lines(recs, genome, [r.name for r in reads],
                      [len(r.seq) for r in reads])
    for rec, line in zip(recs, lines):
        c = line.split("\t")
        qlen, qs, qe = int(c[1]), int(c[2]), int(c[3])
        tlen, ts, te = int(c[6]), int(c[7]), int(c[8])
        nm, blk = int(c[9]), int(c[10])
        assert 0 <= qs < qe <= qlen
        assert 0 <= ts < te <= tlen
        assert nm <= blk
        # Perfect reads: high identity (extensions may run a little
        # past the true overlap into diverged sequence, exactly like
        # the reference's extension loop — those columns carry gaps
        # and mismatches).
        assert nm >= 0.95 * blk
        assert int(c[12].split(":")[-1]) == rec.score


def test_cli_paf_out(data_dir, tmp_path):
    import subprocess
    import sys
    from pathlib import Path

    d = data_dir / "tiny"
    env = {"PYTHONPATH": str(Path(__file__).resolve().parent.parent),
           "PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
           "HOME": "/root"}
    r = subprocess.run(
        [sys.executable, "-m", "darwin_tpu.cli", str(d / "reads.fasta"),
         str(d / "reads.fasta"), "--params", str(d / "params.cfg"),
         "--batch-size", "64", "--out-dir", str(tmp_path),
         "--paf-out", str(tmp_path / "out.paf")],
        capture_output=True, text=True, env=env, cwd=tmp_path,
        timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = (tmp_path / "out.paf").read_text().splitlines()
    want = len((d / "out.darwin").read_text().splitlines())
    assert len(lines) == want  # same records, PAF form
    for line in lines:
        assert len(line.split("\t")) == 13
