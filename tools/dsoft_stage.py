"""Device D-SOFT stage timing: searchsorted vs twolevel lookup.

E.coli-scale replicated table (4.6 Mb, k=14), R x 10 kb reads, whole
dsoft_device_batch timed with a device_get fence.  One mode per
invocation: the dense 4^k path is known to wedge this environment's
remote compiler, so any new mode gets its own process.

Usage: python tools/dsoft_stage.py {searchsorted|twolevel} [R] [L]

L (read length, default 10000) sets the minimizer-scan unroll and so
the compiled program size: over the tunnel relay the 10 kb program's
compile can exceed 15 min (observed 2026-08-18), while shorter reads
compile in the usual 1-3 min — use L=2000 for a feasible on-chip A/B
(the lookup stage under test is L-independent per lane).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> int:
    mode = sys.argv[1]
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    import jax

    from darwin_tpu.dsoft.device import (dsoft_device_batch,
                                         make_twolevel_index, pad_reads)
    from darwin_tpu.engine.seqbank import SeqBank
    from darwin_tpu.index.seed_table import SeedTable

    rng = np.random.default_rng(3)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    G = 4_600_000
    ref = rng.choice(alpha, size=G).astype(np.uint8)
    t0 = time.time()
    table = SeedTable.build(ref, 14, 16, 64, 8)
    print(f"table: {len(table.pos)} entries "
          f"({time.time()-t0:.1f} s build)", flush=True)

    reads = []
    for _ in range(R):
        s = int(rng.integers(0, G - L))
        r = ref[s:s + L].copy()
        mut = rng.random(L) < 0.12
        r[mut] = rng.choice(alpha, size=int(mut.sum()))
        reads.append(r)
    bank = SeqBank(reads)
    Q, lens = pad_reads(bank, range(R))

    kw = dict(k=table.k, w=table.w, bin_size=table.bin_size,
              kmer_max_occ=table.kmer_max_occurence, num_seeds_cap=800,
              threshold=20, max_candidates=10**6, tup_max=8192,
              cand_max=512)
    if mode == "twolevel":
        t0 = time.time()
        tl = make_twolevel_index(np.asarray(table.hashes))
        print(f"twolevel build {time.time()-t0:.2f} s, steps={tl[5]}",
              flush=True)
        args = (Q, lens, tl[:5], np.asarray(table.pos))
        kw.update(index="twolevel", tl_steps=tl[5])
    else:
        args = (Q, lens, np.asarray(table.hashes),
                np.asarray(table.pos))
        kw.update(index="searchsorted")

    t0 = time.time()
    out = jax.device_get(dsoft_device_batch(*args, **kw))
    print(f"{mode}: compile+first {time.time()-t0:.1f} s", flush=True)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = jax.device_get(dsoft_device_batch(*args, **kw))
    dt = (time.time() - t0) / reps
    counts = out[2]
    print(f"{mode}: {dt:.2f} s/batch ({R} reads), "
          f"{int(np.sum(counts))} candidates, "
          f"overflow {int(np.sum(out[3]))}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
