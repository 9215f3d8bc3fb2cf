"""On-chip A/B of the device D-SOFT hash-LOOKUP stage in isolation.

The twolevel default flip (dsoft/device.py default_index_mode) targets
exactly this stage: round-2 stage split showed the two per-minimizer
binary searches cost 5.8 s of the 8.75 s device seeding wall at E.coli
scale.  The full dsoft_device_batch program wedges the tunnel's remote
compiler (the vmapped 5-operand sorts; observed 44+ min, round-3 and
round-4 attempts) — so this probe compiles ONLY the lookup stage, a
small program, on the real minimizer-hash stream of R x 10 kb reads
against the E.coli-scale table.

One mode per process (compile isolation):
    python tools/dsoft_lookup_ab.py {searchsorted|twolevel} [R] [L]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import darwin_tpu  # noqa: F401  (THP madvise guard)
import numpy as np  # noqa: E402


def host_lane_hashes(reads: np.ndarray, k: int, LP: int,
                     w: int = 0) -> np.ndarray:
    """[R, LP] uint32 k-mer hash per scan lane (the stream the device
    lookup consumes), built with the same 2-bit/Wang-hash convention as
    dsoft/device.py's scan — computed host-side so the probe's device
    program is ONLY the lookup.  w > 0 additionally applies the
    window-minimum, making lookup hit rates match the real scan."""
    from darwin_tpu.dsoft.device import _TWOBIT_LUT

    R, L = reads.shape
    codes = np.zeros((R, LP), np.uint32)
    codes[:, :L] = _TWOBIT_LUT[reads]
    seed = np.zeros((R, LP), np.uint32)
    for t in range(k):
        seed |= np.roll(codes, -t, axis=1) << np.uint32(2 * t)
    m = np.uint32((1 << (2 * k)) - 1)
    key = seed
    key = (~key + (key << np.uint32(21))) & m
    key ^= key >> np.uint32(24)
    key = ((key + (key << np.uint32(3))) + (key << np.uint32(8))) & m
    key ^= key >> np.uint32(14)
    key = ((key + (key << np.uint32(2))) + (key << np.uint32(4))) & m
    key ^= key >> np.uint32(28)
    key = (key + (key << np.uint32(31))) & m
    out = key
    for s in range(1, w):
        out = np.minimum(out, np.roll(key, s, axis=1))
    return out


def main() -> int:
    mode = sys.argv[1]
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    import jax
    import jax.numpy as jnp

    from darwin_tpu.dsoft.device import (make_twolevel_index,
                                         twolevel_lookup)
    from darwin_tpu.index.seed_table import SeedTable

    rng = np.random.default_rng(3)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    G = 4_600_000
    ref = rng.choice(alpha, size=G).astype(np.uint8)
    t0 = time.time()
    table = SeedTable.build(ref, 14, 16, 64, 8)
    print(f"table: {len(table.pos)} entries "
          f"({time.time()-t0:.1f} s build)", flush=True)

    reads = np.empty((R, L), np.uint8)
    for r in range(R):
        s = int(rng.integers(0, G - L))
        rd = ref[s:s + L].copy()
        mut = rng.random(L) < 0.12
        rd[mut] = rng.choice(alpha, size=int(mut.sum()))
        reads[r] = rd
    LP = L + 16
    hv = host_lane_hashes(reads, table.k, LP, w=table.w).reshape(-1)
    print(f"{hv.size} lookup lanes", flush=True)

    if mode == "twolevel":
        bf = int(sys.argv[4]) if len(sys.argv) > 4 else 4
        t0 = time.time()
        hd, crs, bkt, base, shift, steps = make_twolevel_index(
            np.asarray(table.hashes), bucket_factor=bf)
        print(f"twolevel build {time.time()-t0:.2f} s, steps={steps}, "
              f"index {hd.nbytes + crs.nbytes + bkt.nbytes:,} B",
              flush=True)

        @jax.jit
        def probe(hv, hd, crs, bkt, base, shift):
            s, e = twolevel_lookup(hv, hd, crs, bkt, base[0], shift[0],
                                   steps=steps)
            return (e - s).astype(jnp.int64).sum(), s.sum(), e.sum()

        args = (hv, hd, crs, bkt, base, shift)
    else:
        th = np.asarray(table.hashes)

        @jax.jit
        def probe(hv, th):
            s = jnp.searchsorted(th, hv, side="left")
            e = jnp.searchsorted(th, hv, side="right")
            return (e - s).astype(jnp.int64).sum(), s.sum(), e.sum()

        args = (hv, th)

    t0 = time.time()
    out = jax.device_get(probe(*args))
    print(f"{mode}: compile+first {time.time()-t0:.1f} s", flush=True)
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = jax.device_get(probe(*args))
    dt = (time.time() - t0) / reps
    print(f"{mode}: {dt*1e3:.1f} ms/pass ({hv.size} lanes, "
          f"{dt/hv.size*1e9:.2f} ns/lane), occ_sum={int(out[0])}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
