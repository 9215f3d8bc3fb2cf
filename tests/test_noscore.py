"""NOSCORE-mode parity (reference -D NOSCORE build: skip rescoring,
emit score-0 records with no score gate, cuda_header.h:248-259 short
output / gact.cpp NOSCORE branches)."""

from __future__ import annotations

import re

import pytest

from darwin_tpu.config import Params
from darwin_tpu.io.fasta import parse_fasta
from darwin_tpu.pipeline import run_pipeline


def _coords(record: str) -> tuple:
    # "ref_id: R, query_id: Q, ab: A, ae: B, bb: C, be: D, score: S,
    #  comp: X" -> everything except the score field
    f = dict(re.findall(r"(\w+): ([^,]+)", record))
    return tuple(f[k] for k in
                 ("ref_id", "query_id", "ab", "ae", "bb", "be", "comp"))


@pytest.mark.slow
def test_noscore_host_and_device_engines_agree(data_dir):
    d = data_dir / "tiny"
    params = Params.from_cfg(d / "params.cfg")
    reads = parse_fasta(d / "reads.fasta")
    host = run_pipeline(reads, reads, params, same_file=True,
                        batch_size=32, engine="host",
                        compute_score=False)
    dev = run_pipeline(reads, reads, params, same_file=True,
                       batch_size=32, engine="device",
                       compute_score=False)
    assert set(host.records) == set(dev.records)
    # NOSCORE emits score-0 records.
    assert all("score: 0," in r for r in host.records)


@pytest.mark.slow
def test_noscore_is_coordinate_superset_of_scored(data_dir):
    d = data_dir / "tiny"
    params = Params.from_cfg(d / "params.cfg")
    reads = parse_fasta(d / "reads.fasta")
    noscore = run_pipeline(reads, reads, params, same_file=True,
                           batch_size=32, compute_score=False)
    scored = set(_coords(r) for r in
                 (d / "out.darwin").read_text().splitlines())
    got = set(_coords(r) for r in noscore.records)
    # Scored output additionally drops score<=0 records, so the
    # NOSCORE coordinate set must cover it.
    assert scored <= got
