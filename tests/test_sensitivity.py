"""Accuracy evaluation: the sensitivity/specificity harness itself and
an end-to-end accuracy gate on the noisy fixture (the TPU analogue of
the reference flow README:22-26 -> measure_sensitivity_PBSIM.py)."""

from __future__ import annotations

import numpy as np
import pytest

from darwin_tpu.config import Params
from darwin_tpu.eval.datagen import sample_reads, synth_genome
from darwin_tpu.eval.sensitivity import (measure_sensitivity,
                                         theoretical_overlaps)
from darwin_tpu.golden.gact import format_record
from darwin_tpu.io.fasta import parse_fasta


def test_theoretical_overlaps_interval_rule():
    names = ["R0_0_2000", "R1_1500_2000", "R2_2600_1000", "R3_9000_500"]
    # R0-R1 overlap 500 bp (< 1000 -> excluded at default), R1-R2
    # overlap 900 (excluded), with min_overlap=400 both count.
    assert theoretical_overlaps(names) == []
    got = set(theoretical_overlaps(names, min_overlap=400))
    assert got == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_measure_sensitivity_counts():
    names = ["R0_0_2000", "R1_500_2000"]  # true overlap 1500 bp
    rec_hit = format_record("R0_0_2000", "R1_500_2000",
                            500, 1999, 0, 1499, 700, 0)
    res = measure_sensitivity([rec_hit], names)
    # AB->BA mirroring makes both direction pairs TP.
    assert (res.tp, res.fn, res.fp) == (2, 0, 0)
    assert res.sensitivity == 1.0

    # Low score is filtered -> the truth pair becomes a FN (both dirs).
    rec_low = format_record("R0_0_2000", "R1_500_2000",
                            500, 1999, 0, 1499, 100, 0)
    res = measure_sensitivity([rec_low], names)
    assert (res.tp, res.fn) == (0, 2)

    # An overlap between non-overlapping reads is a FP.
    names_fp = ["R0_0_2000", "R1_50000_2000"]
    res = measure_sensitivity([rec_hit], names_fp)
    assert res.fp == 2 and res.tp == 0


def test_datagen_names_roundtrip():
    import re
    rng = np.random.default_rng(0)
    g = synth_genome(5000, rng)
    reads = sample_reads(g, 5, 1000, rng, error_rate=0.05)
    for i, (name, seq) in enumerate(reads):
        rid, pos, length = [int(x) for x in re.findall(r"\d+", name)]
        assert rid == i
        assert 0 <= pos < 5000
        assert length == len(seq)  # post-mutation length is encoded


@pytest.mark.slow
def test_pipeline_sensitivity_on_noisy_fixture(data_dir):
    from darwin_tpu.pipeline import run_pipeline
    d = data_dir / "noisy"
    params = Params.from_cfg(d / "params.cfg")
    reads = parse_fasta(d / "reads.fasta")
    result = run_pipeline(reads, reads, params, same_file=True,
                          batch_size=64)
    names = [r.name for r in reads]
    # The fixture's reads are ~10% error over a small genome; require
    # the same accuracy the reference binary achieves on this input
    # (its records equal ours bit-exactly per test_engine_e2e, so this
    # gate tracks the evaluator end-to-end, not the aligner).
    ref_res = measure_sensitivity(
        sorted(set((d / "out.darwin").read_text().splitlines())), names)
    got_res = measure_sensitivity(sorted(set(result.records)), names)
    assert (got_res.tp, got_res.fn, got_res.fp) == (
        ref_res.tp, ref_res.fn, ref_res.fp)
    assert got_res.sensitivity >= 0.5
