"""Engine iteration profiler: synthetic calls of known tile depth.

Usage: python tools/engine_prof.py [N_calls]
Reports warm ms/iteration with and without rescoring.
"""
import sys, time
import numpy as np
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from darwin_tpu.config import Params
from darwin_tpu.engine.batch import GactCalls
from darwin_tpu.engine.device_batch import DeviceGactEngine
from darwin_tpu.engine.seqbank import SeqBank
from darwin_tpu.index.genome import Genome
from darwin_tpu.io.fasta import FastaRecord
from darwin_tpu.eval.datagen import synth_genome

rng = np.random.default_rng(0)
G = 2_000_000
genome_s = synth_genome(G, rng)
genome = Genome([FastaRecord(["ref"], genome_s)], 64)

L = 4000  # read length; anchor at middle -> ~L/2/ET tiles per direction
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
starts = rng.integers(0, G - L, size=N)
reads = [np.frombuffer(genome_s[s:s+L].encode(), dtype=np.uint8) for s in starts]
bank = SeqBank(reads)
calls = GactCalls(
    ref_id=np.zeros(N, np.int64), query_id=np.arange(N, dtype=np.int64),
    ref_pos=(starts + L // 2).astype(np.int64),
    query_pos=np.full(N, L // 2, dtype=np.int64))

ET = 200
iters_est = 2 * (L // 2 // ET + 1) + 3
for score in (True, False):
    eng = DeviceGactEngine(
        genome, bank, tile_size=320, early_terminate=ET,
        first_tile_score_threshold=35, match=1, mismatch=-1,
        gap_open=-1, gap_extend=-1, same_file=False, batch_size=N,
        compute_score=score)
    recs = eng.run(calls, False)  # compile
    t0 = time.time(); reps = 3
    for _ in range(reps):
        recs = eng.run(calls, False)
    dt = (time.time() - t0) / reps
    print(f"score={score} N={N}: {dt*1e3:.0f} ms, ~{iters_est} iters -> "
          f"{dt*1e3/iters_est:.1f} ms/iter, {len(recs)} records")
