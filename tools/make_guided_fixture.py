import sys
import numpy as np
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from darwin_tpu.eval.datagen import sample_reads, synth_genome
from darwin_tpu.io.fasta import write_fasta

rng = np.random.default_rng(7)
# Multi-chromosome reference: 3 pieces with lengths NOT multiples of
# bin_size (stresses N padding + bin/chr decode maps).
chroms = [("chr1", synth_genome(70_003, rng)),
          ("chr2", synth_genome(50_017, rng)),
          ("chr3", synth_genome(30_001, rng))]
write_fasta("tests/data/guided/ref.fasta", chroms)

# Mixed-length reads sampled from the concatenation of the pieces,
# names encode origin in the FIRST chromosome's coordinates only for
# reads from chr1 (eval not used here; parity is the bar).
reads = []
i = 0
for cname, cseq in chroms:
    for _ in range(6):
        L = int(rng.integers(1500, 12000))
        s = int(rng.integers(0, len(cseq) - L))
        r = np.frombuffer(cseq[s:s+L].encode(), dtype=np.uint8).copy()
        mut = rng.random(len(r)) < 0.1
        r[mut] = np.frombuffer(b"ACGT", dtype=np.uint8)[
            rng.integers(0, 4, size=int(mut.sum()))]
        if rng.random() < 0.4:
            comp = {65:84,84:65,67:71,71:67,78:78}
            r = np.array([comp[c] for c in r[::-1]], dtype=np.uint8)
        reads.append((f"Q{i}_{cname}_{s}_{L}", r.tobytes().decode()))
        i += 1
write_fasta("tests/data/guided/reads.fasta", reads)
print("ref pieces:", len(chroms), "reads:", len(reads))
