"""Tile-geometry probe: GCUPS of the full packed6 step at a given T.

Usage: python tools/tile_geom.py T [ET]

Why: the DP kernel's lane axis is TJP = roundup(T+1, 128), so the
reference's GPU-chosen tile_size = 320 (params.cfg:22) pads 321 -> 384
lanes and wastes ~17% of every vector op.  A TPU-chosen tile size
keeps T % 8 == 0 (row blocking) and T+1 close under a lane multiple:

    T=320 -> TJP=384  (83.3% lanes useful)   reference default
    T=248 -> TJP=256  (96.9%)
    T=376 -> TJP=384  (97.9%)
    T=504 -> TJP=512  (98.4%)

Each config runs in its own process (compile isolation; see
docs/ROADMAP.md on Mosaic crashers).  Prints one line:
    T=... step_ms=... dp_ms=... gcups=...

GCUPS counts B*T*T cells/step (same definition as bench.py).
"""

from __future__ import annotations

import sys
import time

import numpy as np

B, V = 2048, 16


def main() -> None:
    T = int(sys.argv[1])
    ET = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    import jax
    import jax.numpy as jnp

    from darwin_tpu.ops.pallas_dp import align_tiles_pallas
    from darwin_tpu.ops.traceback import traceback_packed6_jax

    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = alpha[rng.integers(0, 4, size=(V, B, T))]
    queries = refs.copy()
    mut = rng.random((V, B, T)) < 0.1
    queries[mut] = alpha[rng.integers(0, 4, size=int(mut.sum()))]
    rlen = np.full(B, T, dtype=np.int32)
    qlen = np.full(B, T, dtype=np.int32)
    firsts = np.zeros(B, dtype=bool)
    firsts[: B // 2] = True
    kw = dict(match=1, mismatch=-1, gap_open=-1, gap_extend=-1)

    def full_step(r, q):
        out = align_tiles_pallas(r, q, rlen, qlen, block_b=128,
                                 dir_format="packed6", **kw)
        ops, _mb, i_s, j_s = traceback_packed6_jax(
            out["dir_words"], rlen, qlen, firsts, out["max_i"],
            out["max_j"], early_terminate=ET)
        return (ops.astype(jnp.int32).sum() + i_s.sum() + j_s.sum()
                + out["max_score"].sum())

    def dp_step(r, q):
        out = align_tiles_pallas(r, q, rlen, qlen, block_b=128,
                                 dir_format="packed6", **kw)
        return (out["dir_words"][:, ::37, ::41].astype(jnp.int32).sum()
                + out["max_score"].sum() + out["max_i"].sum())

    def chained(step):
        def fn(rs, qs):
            def body(c, rq):
                return c + step(*rq), None
            tot, _ = jax.lax.scan(body, jnp.int32(0), (rs, qs))
            return tot
        return jax.jit(fn)

    rs = jax.device_put(refs)
    qs = jax.device_put(queries)

    def timed(jfn, reps=3):
        jax.device_get(jfn(rs, qs))  # compile
        t0 = time.time()
        for _ in range(reps):
            jax.device_get(jfn(rs, qs))
        return (time.time() - t0) / reps

    dt = timed(chained(full_step))
    dt_dp = timed(chained(dp_step))
    step_ms = dt / V * 1e3
    gcups = float(V) * B * T * T / dt / 1e9
    print(f"T={T} ET={ET} step_ms={step_ms:.2f} "
          f"dp_ms={dt_dp / V * 1e3:.2f} gcups={gcups:.2f}", flush=True)


if __name__ == "__main__":
    main()
