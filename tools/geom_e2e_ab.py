"""Same-process e2e A/B of GACT tile geometries (VERDICT r3 ask #4).

Cross-process scale_test walls swing with the 1-vCPU throttle; this
runs the full warm pipeline (table + banks + seed + align) for each
tile_size in ONE process, alternating geometries round-robin so
machine drift hits all of them equally, and reports best-of-N warm
wall + reads/s per geometry.  Dataset and params mirror scale_test's
E.coli default (4.6 Mb, 460 x 10 kb, 12% error, seed 42); records per
geometry are cross-checked against the corresponding scale_test ref
run when its workdir is present.

Usage:
    python tools/geom_e2e_ab.py [--tiles 376,504,248] [--reps 3]
        [--genome 4600000] [--reads 460] [--guided]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tiles", default="376,504,248")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--genome", type=int, default=4_600_000)
    p.add_argument("--reads", type=int, default=460)
    p.add_argument("--read-len", type=int, default=10_000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--guided", action="store_true")
    p.add_argument("--batch-size", type=int, default=2048)
    args = p.parse_args(argv)

    from darwin_tpu.config import Params
    from darwin_tpu.eval.datagen import sample_reads, synth_genome
    from darwin_tpu.io.fasta import FastaRecord
    from darwin_tpu.pipeline import run_pipeline

    rng = np.random.default_rng(args.seed)
    genome = synth_genome(args.genome, rng)
    reads = [FastaRecord(n, s) for n, s in
             sample_reads(genome, args.reads, args.read_len, rng,
                          error_rate=0.12, rc_fraction=0.5)]
    refs = [FastaRecord("genome_0", genome)] if args.guided else reads

    import jax
    engine = "device" if jax.default_backend() != "cpu" else "host"
    tiles = [int(t) for t in args.tiles.split(",")]
    walls = {t: [] for t in tiles}
    recs = {}

    # One cold pass per geometry first (pays each compile up front so
    # the timed alternating passes are all warm).
    for t in tiles:
        params = Params.from_cfg(str(REPO / "configs" / "tpu.cfg"))
        params.tile_size = t
        t0 = time.time()
        res = run_pipeline(refs, reads, params,
                           same_file=not args.guided,
                           batch_size=args.batch_size, engine=engine)
        print(f"T={t}: cold {time.time() - t0:.1f} s, "
              f"{len(set(res.records))} unique records", flush=True)
        recs[t] = sorted(set(res.records))

    for rep in range(args.reps):
        for t in tiles:
            params = Params.from_cfg(str(REPO / "configs" / "tpu.cfg"))
            params.tile_size = t
            t0 = time.time()
            res = run_pipeline(refs, reads, params,
                               same_file=not args.guided,
                               batch_size=args.batch_size, engine=engine)
            w = time.time() - t0
            walls[t].append(w)
            print(f"rep {rep} T={t}: {w:.2f} s", flush=True)
            assert sorted(set(res.records)) == recs[t]

    print("\ngeometry  best_s  median_s  reads/s(best)")
    for t in tiles:
        ws = sorted(walls[t])
        best, med = ws[0], ws[len(ws) // 2]
        print(f"T={t:<6} {best:6.2f}  {med:7.2f}  "
              f"{args.reads / best:8.1f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
