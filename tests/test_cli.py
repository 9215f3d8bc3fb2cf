"""CLI differential test: reference-style invocation, merged output
equals the reference binary's sorted-unique records."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_cli_matches_reference(data_dir, tmp_path):
    d = data_dir / "tiny"
    cmd = [sys.executable, "-m", "darwin_tpu.cli",
           str(d / "reads.fasta"), str(d / "reads.fasta"), "2",
           "--params", str(d / "params.cfg"),
           "--batch-size", "64",
           "--out-dir", str(tmp_path),
           "--merged-out", str(tmp_path / "out.darwin")]
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root"}
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "darwin.0.out").exists()
    assert (tmp_path / "darwin.1.out").exists()
    got = (tmp_path / "out.darwin").read_text().splitlines()
    want = sorted(set((d / "out.darwin").read_text().splitlines()))
    assert got == want
