"""End-to-end CLI benchmark: N-run wall-clock average.

Mirror of the reference's benchmark.py methodology (run the CLI N
times, average the wall time, surface errors; benchmark.py:34-79).

Usage:
    python tools/bench_e2e.py REF.fasta READS.fasta \\
        [--n 5] [--params params.cfg] [--batch-size 2048] [-- extra...]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("reference")
    p.add_argument("reads")
    p.add_argument("--n", type=int, default=5)
    p.add_argument("--params", default="params.cfg")
    p.add_argument("--batch-size", type=int, default=2048)
    p.add_argument("extra", nargs="*", default=[],
                   help="extra CLI flags after --")
    args = p.parse_args(argv)

    times = []
    for i in range(args.n):
        cmd = [sys.executable, "-m", "darwin_tpu.cli", args.reference,
               args.reads, "--params", args.params,
               "--batch-size", str(args.batch_size),
               "--out-dir", f"/tmp/bench_e2e_{i}"] + args.extra
        t0 = time.time()
        r = subprocess.run(cmd, capture_output=True, text=True,
                           cwd=REPO)
        dt = time.time() - t0
        if r.returncode != 0:
            print(f"run {i}: FAILED\n{r.stderr[-1500:]}")
            return 1
        times.append(dt)
        print(f"run {i}: {dt:.2f} s")
    # First run pays jit compiles; report both like the reference's
    # repeated-run methodology intends.
    avg_all = sum(times) / len(times)
    warm = times[1:] or times
    print(f"average ({args.n} runs): {avg_all:.2f} s; "
          f"warm average: {sum(warm) / len(warm):.2f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
