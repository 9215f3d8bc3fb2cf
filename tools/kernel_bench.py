"""DP-kernel micro-benchmark with trustworthy fencing.

Usage: python tools/kernel_bench.py [block_b ...]
Chains V distinct batches in one dispatch, fences with device_get, and
also checks parity vs the lax formulation on a slice.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from darwin_tpu.ops.pallas_dp import align_tiles_pallas
from darwin_tpu.ops.reference_dp import align_tiles_jax

B, T, V = 2048, 320, 8


def main() -> None:
    blocks = [int(x) for x in sys.argv[1:]] or [128, 256, 512]
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = alpha[rng.integers(0, 4, size=(V, B, T))]
    queries = refs.copy()
    mut = rng.random((V, B, T)) < 0.1
    queries[mut] = alpha[rng.integers(0, 4, size=int(mut.sum()))]
    rlen = np.full(B, T, dtype=np.int32)
    qlen = np.full(B, T, dtype=np.int32)
    kw = dict(match=1, mismatch=-1, gap_open=-1, gap_extend=-1)

    # Parity vs lax on a slice.
    want = align_tiles_jax(refs[0][:32], queries[0][:32], rlen[:32],
                           qlen[:32], **kw)

    refs_d = jax.device_put(refs)
    queries_d = jax.device_put(queries)

    for bb in blocks:
        got = align_tiles_pallas(refs[0][:256], queries[0][:256],
                                 rlen[:256], qlen[:256],
                                 block_b=min(bb, 256), **kw)
        ok = all(
            np.array_equal(np.asarray(got[k])[:32], np.asarray(want[k]))
            for k in ("max_score", "max_i", "max_j", "pos_score"))
        ok = ok and np.array_equal(
            np.asarray(got["dir"])[:32, :, : want["dir"].shape[2]],
            np.asarray(want["dir"]))

        def chained(rs, qs):
            def body(c, rq):
                out = align_tiles_pallas(rq[0], rq[1], rlen, qlen,
                                         block_b=bb, **kw)
                return (c + out["dir"].astype(jnp.int32).sum()
                        + out["max_score"].sum()
                        + out["pos_score"].sum()), None
            tot, _ = jax.lax.scan(body, jnp.int32(0), (rs, qs))
            return tot

        jc = jax.jit(chained)
        jax.device_get(jc(refs_d, queries_d))
        t0 = time.time()
        s = jax.device_get(jc(refs_d, queries_d))
        dt = (time.time() - t0) / V
        print(f"block_b={bb}: parity={'OK' if ok else 'FAIL'} "
              f"dp={dt*1e3:.2f} ms/batch "
              f"{B*T*T/dt/1e9:.1f} GCUPS (sink {int(s)})")


if __name__ == "__main__":
    main()
