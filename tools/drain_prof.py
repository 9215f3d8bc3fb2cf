"""Two-tier drain A/B: engine wall + slot utilization, drain on/off.

Synthetic workload shaped like real long-read batches: many calls
(N >> B) with skewed extension depths, so the final iterations run
with few active slots unless the drain re-dispatches stragglers into
a small-B engine.  Reports wall, iterations, and mean active-slot
utilization for both settings, and checks the record sets match.

Usage: python tools/drain_prof.py [N_calls] [batch]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from darwin_tpu.engine.batch import GactCalls  # noqa: E402
from darwin_tpu.engine.device_batch import DeviceGactEngine  # noqa: E402
from darwin_tpu.engine.seqbank import SeqBank  # noqa: E402
from darwin_tpu.eval.datagen import synth_genome  # noqa: E402
from darwin_tpu.index.genome import Genome  # noqa: E402
from darwin_tpu.io.fasta import FastaRecord  # noqa: E402


def main() -> int:
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    rng = np.random.default_rng(1)
    G = 4_600_000
    genome_s = synth_genome(G, rng)
    genome = Genome([FastaRecord(["ref"], genome_s)], 64)

    # Skewed depths: 85% short extensions, 15% long (10 kb reads).
    lens = np.where(rng.random(N) < 0.85, 2_000, 10_000)
    n_reads = 512
    read_len = 10_000
    starts = rng.integers(0, G - read_len, size=n_reads)
    reads = [np.frombuffer(genome_s[s:s + read_len].encode(),
                           dtype=np.uint8) for s in starts]
    bank = SeqBank(reads)
    qid = rng.integers(0, n_reads, size=N)
    # Anchor so the forward extension spans ~lens/2 each way.
    qpos = np.minimum(lens // 2, read_len // 2)
    calls = GactCalls(
        ref_id=np.zeros(N, np.int64), query_id=qid.astype(np.int64),
        ref_pos=(starts[qid] + qpos).astype(np.int64),
        query_pos=qpos.astype(np.int64))

    results = {}
    for drain in (False, True):
        eng = DeviceGactEngine(
            genome, bank, tile_size=320, early_terminate=200,
            first_tile_score_threshold=35, match=1, mismatch=-1,
            gap_open=-1, gap_extend=-1, same_file=False, batch_size=B,
            compute_score=True)
        eng.drain_enabled = drain
        recs = eng.finish(eng.run_async(calls, False))  # compile
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            recs = eng.finish(eng.run_async(calls, False))
        wall = (time.time() - t0) / reps
        util = eng.last_active_sum / max(1, eng.last_iters) / B
        print(f"drain={int(drain)}: {wall*1e3:.0f} ms/batch, "
              f"iters {eng.last_iters} "
              f"(+{eng.last_drain_redispatches} re-dispatch), "
              f"mean active/B {util:.2f}, {len(recs)} records",
              flush=True)
        results[drain] = sorted(
            (r.ref_id, r.query_id, r.ab, r.ae, r.bb, r.be, r.score)
            for r in recs)
    assert results[False] == results[True], "record sets differ!"
    print("record sets identical", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
