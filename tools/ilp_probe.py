"""One ILP-interleave variant per process (a Mosaic abort takes the
whole client down and loses buffered stdout, so each variant runs
isolated and unbuffered).

Usage: python tools/ilp_probe.py <interleave> [block_b] [dir_format]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

B, T, V = 2048, 320, 16


def main() -> int:
    il = int(sys.argv[1])
    bb = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    fmt = sys.argv[3] if len(sys.argv) > 3 else "packed"
    import jax
    import jax.numpy as jnp

    from darwin_tpu.ops.pallas_dp import align_tiles_pallas

    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = alpha[rng.integers(0, 4, size=(V, B, T))]
    queries = refs.copy()
    mut = rng.random((V, B, T)) < 0.1
    queries[mut] = alpha[rng.integers(0, 4, size=int(mut.sum()))]
    rlen = np.full(B, T, dtype=np.int32)
    kw = dict(match=1, mismatch=-1, gap_open=-1, gap_extend=-1)

    def step(r, q):
        out = align_tiles_pallas(r, q, rlen, rlen, block_b=bb,
                                 dir_format=fmt, interleave=il,
                                 **kw)
        return (out["dir_words"][:, ::64, ::64].sum()
                + out["max_score"].sum())

    def chained(rs, qs):
        def body(c, rq):
            return c + step(*rq), None
        tot, _ = jax.lax.scan(body, jnp.int32(0), (rs, qs))
        return tot

    jfn = jax.jit(chained)
    rd, qd = jax.device_put(refs), jax.device_put(queries)
    print(f"interleave={il} block_b={bb} fmt={fmt}: compiling...",
          flush=True)
    sink = int(jax.device_get(jfn(rd, qd)))
    t0 = time.time()
    for _ in range(3):
        sink ^= int(jax.device_get(jfn(rd, qd)))
    dt = (time.time() - t0) / 3
    print(f"interleave={il} block_b={bb} fmt={fmt}: "
          f"{dt/V*1e3:.2f} ms/step "
          f"({B*T*T*V/dt/1e9:.2f} GCUPS, sink={sink})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
