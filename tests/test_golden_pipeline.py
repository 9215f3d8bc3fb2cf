"""Differential test: golden scalar pipeline vs the reference binary.

The `tiny` fixture's out.darwin was produced by the reference CPU build
(see tests/make_fixtures.py); the golden pipeline must reproduce it
exactly (sorted-unique record sets, matching the reference's
`cat darwin.*.out | sort | uniq` merge, README:25).
"""

import pytest

from darwin_tpu.config import Params
from darwin_tpu.golden.pipeline import golden_pipeline
from darwin_tpu.io.fasta import parse_fasta


@pytest.mark.slow
def test_golden_matches_reference_binary(data_dir):
    d = data_dir / "tiny"
    params = Params.from_cfg(d / "params.cfg")
    reads = parse_fasta(d / "reads.fasta")
    got = golden_pipeline(reads, reads, params, same_file=True)
    want = set((d / "out.darwin").read_text().splitlines())
    assert set(got) == want
