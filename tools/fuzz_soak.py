"""Long-running randomized soak: production pipeline vs golden spec.

Reuses the fuzz-instance generators from tests/test_fuzz_pipeline.py
over an arbitrary fresh seed range (the pinned test seeds stay in the
suite; this drives NEW draws each round for the soak tally recorded in
docs/DESIGN.md).  CPU backend, one instance at a time, stops at the
first mismatch with a full repro line.

Usage: python tools/fuzz_soak.py START COUNT [--guided]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from darwin_tpu.golden.pipeline import golden_pipeline
    from darwin_tpu.pipeline import run_pipeline
    from test_fuzz_pipeline import _guided_instance, _instance

    start = int(sys.argv[1])
    count = int(sys.argv[2])
    guided = "--guided" in sys.argv
    t0 = time.time()
    for n, seed in enumerate(range(start, start + count)):
        if guided:
            params, chroms, reads = _guided_instance(seed)
            want = set(golden_pipeline(chroms, reads, params,
                                       same_file=False))
            got = run_pipeline(chroms, reads, params, same_file=False,
                               batch_size=16)
        else:
            params, reads = _instance(seed)
            want = set(golden_pipeline(reads, reads, params,
                                       same_file=True))
            bs = int(np.random.default_rng(seed).choice([8, 32, 64]))
            got = run_pipeline(reads, reads, params, same_file=True,
                               batch_size=bs)
        if set(got.records) != want:
            print(f"MISMATCH seed={seed} guided={guided} "
                  f"params={params} "
                  f"missing={sorted(want - set(got.records))[:3]} "
                  f"extra={sorted(set(got.records) - want)[:3]}",
                  flush=True)
            return 1
        if (n + 1) % 10 == 0:
            print(f"{n + 1}/{count} exact "
                  f"({time.time() - t0:.0f} s)", flush=True)
    print(f"SOAK OK: {count} instances exact "
          f"(seeds {start}-{start + count - 1}, guided={guided}, "
          f"{time.time() - t0:.0f} s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
