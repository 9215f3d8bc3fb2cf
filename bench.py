"""Headline benchmark: GACT tile-alignment GCUPS per chip.

Prints ONE JSON line:
  {"metric": "gact_gcups", "value": <GCUPS>, "unit": "GCUPS",
   "vs_baseline": <ratio>}

Measured quantity: the full tile step (DP kernel + vectorized
traceback) on batches of 2048 full TxT tiles — DP cells updated per
second on one chip — at the TPU production tile geometry
(configs/tpu.cfg: tile_size=376, so the kernel's padded lane axis
TJP = roundup(T+1, 128) = 384 keeps 97.9% of lanes useful; the
reference's GPU-chosen 320 wastes 17% of every vector op).  The
reference geometry (T=320, the reference's own default) is also
measured and reported as gcups_ref_geom for cross-round continuity.
Output parity at the TPU geometry is differentially tested against
the reference binary running the same params.cfg (tools/scale_test.py
--params configs/tpu.cfg).

V distinct batches are staged on device up front and chained in a
single dispatch (lax.scan), and completion is forced with a host
fetch of a reduction over every output: over the axon relay,
block_until_ready can return before execution finishes, so only a
device_get is a trustworthy fence.  Per-dispatch tunnel RTT is
amortized 1/V and included.

Baseline: the reference implementation's CPU kernel (AlignWithBT,
align.cpp:60-233) measured on this machine at 0.011 GCUPS
single-thread; see BENCH_NOTES.md for methodology (the reference's
CUDA build needs a Kepler GPU and cannot run here).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_CPU_KERNEL_GCUPS = 0.011
# Modeled K40 CUDA-kernel GCUPS (realistic mid-point of the op-census
# cost model in BASELINE.md: ceiling 47, realistic 19-33).  The CUDA
# build cannot run here (needs a Kepler GPU + nvcc); this keeps the
# honest comparison in the bench artifact itself.
MODELED_CUDA_KERNEL_GCUPS = 25.0

B = 2048
T = 376    # TPU production tile geometry (configs/tpu.cfg)
ET = 256   # early_terminate = tile_size - tile_overlap at that config
T_REF = 320  # the reference's own default geometry (continuity row)
ET_REF = 200
V = 16  # distinct batches chained per dispatch


def main() -> None:
    import jax
    import jax.numpy as jnp

    from darwin_tpu.engine.aligner import default_backend
    from darwin_tpu.ops.pallas_dp import align_tiles_pallas
    from darwin_tpu.ops.reference_dp import align_tiles_jax
    from darwin_tpu.ops.traceback import (pack_dir_words6,
                                          traceback_packed6_jax)

    backend = default_backend()
    print(f"backend={jax.default_backend()} kernel={backend} "
          f"B={B} T={T} (ref geom T={T_REF}) V={V}", file=sys.stderr)

    kw = dict(match=1, mismatch=-1, gap_open=-1, gap_extend=-1)

    def measure(t, et, with_dp_split):
        rng = np.random.default_rng(0)
        alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
        refs = alpha[rng.integers(0, 4, size=(V, B, t))]
        queries = refs.copy()
        mut = rng.random((V, B, t)) < 0.1  # ~10% divergence
        queries[mut] = alpha[rng.integers(0, 4, size=int(mut.sum()))]
        rlen = np.full(B, t, dtype=np.int32)
        qlen = np.full(B, t, dtype=np.int32)
        firsts = np.zeros(B, dtype=bool)
        firsts[: B // 2] = True

        def one_step(r, q):
            if backend == "pallas":
                out = align_tiles_pallas(r, q, rlen, qlen, block_b=128,
                                         dir_format="packed6", **kw)
                words = out["dir_words"]
            else:
                out = align_tiles_jax(r, q, rlen, qlen, **kw)
                words = pack_dir_words6(out["dir"])
            ops, _mb, i_s, j_s = traceback_packed6_jax(
                words, rlen, qlen, firsts, out["max_i"], out["max_j"],
                early_terminate=et)
            # Reduce over every output so nothing is DCE'd.
            return (ops.astype(jnp.int32).sum() + i_s.sum() + j_s.sum()
                    + out["max_score"].sum())

        def dp_only_step(r, q):
            if backend == "pallas":
                out = align_tiles_pallas(r, q, rlen, qlen, block_b=128,
                                         dir_format="packed6", **kw)
                words = out["dir_words"]
            else:
                out = align_tiles_jax(r, q, rlen, qlen, **kw)
                words = pack_dir_words6(out["dir"])
            return (words[:, ::37, ::41].astype(jnp.int32).sum()
                    + out["max_score"].sum() + out["max_i"].sum())

        def chained_with(step):
            def chained(rs, qs):
                def body(carry, rq):
                    return carry + step(*rq), None
                total, _ = jax.lax.scan(body, jnp.int32(0), (rs, qs))
                return total
            return jax.jit(chained)

        refs_d = jax.device_put(refs)
        queries_d = jax.device_put(queries)

        def timed(jfn, reps=3):
            sink = int(jax.device_get(jfn(refs_d, queries_d)))
            t0 = time.time()
            for _ in range(reps):
                sink ^= int(jax.device_get(jfn(refs_d, queries_d)))
            return (time.time() - t0) / reps, sink

        dt, sink = timed(chained_with(one_step))
        dt_dp = timed(chained_with(dp_only_step))[0] if with_dp_split \
            else None
        gcups = float(V) * B * t * t / dt / 1e9
        step_ms = dt / V * 1e3
        dp_ms = None if dt_dp is None else dt_dp / V * 1e3
        print(f"T={t}: chained {V} steps {dt*1e3:.1f} ms "
              f"({step_ms:.1f} ms/step"
              + (f" = DP ~{dp_ms:.1f} + traceback "
                 f"~{step_ms - dp_ms:.1f}" if dp_ms is not None else "")
              + f", sink={sink}) -> {gcups:.2f} GCUPS",
              file=sys.stderr)
        return gcups, step_ms, dp_ms

    gcups, step_ms, dp_ms = measure(T, ET, with_dp_split=True)
    gcups_ref_geom = measure(T_REF, ET_REF, with_dp_split=False)[0]

    print(json.dumps({
        "metric": "gact_gcups",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_CPU_KERNEL_GCUPS, 1),
        "vs_cuda_modeled": round(gcups / MODELED_CUDA_KERNEL_GCUPS, 2),
        "tile_size": T,
        "step_ms": round(step_ms, 2),
        "dp_ms": round(dp_ms, 2),
        "traceback_ms": round(step_ms - dp_ms, 2),
        "gcups_ref_geom_t320": round(gcups_ref_geom, 2),
    }))


def supervised() -> int:
    """Run the measurement in a child process with bounded retries.

    The axon tunnel can wedge for tens of minutes (a stale chip grant
    after a killed client, or a relay outage — both observed
    2026-08-17); a hung backend init inside this process cannot be
    timed out, so the measurement runs in a child that can.  Normal
    cold run is ~2-3 min; 15 min per attempt is generous.
    """
    for attempt in range(3):
        if attempt:
            print(f"bench attempt {attempt} failed; retrying in 120 s",
                  file=sys.stderr)
            time.sleep(120)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                timeout=900, stdout=subprocess.PIPE, text=True)
        except subprocess.TimeoutExpired:
            print("bench attempt timed out (wedged tunnel?)",
                  file=sys.stderr)
            continue
        sys.stdout.write(r.stdout)
        if r.returncode == 0 and '"metric"' in r.stdout:
            return 0
        print(f"bench attempt exited {r.returncode}", file=sys.stderr)
    print(json.dumps({
        "metric": "gact_gcups", "value": 0, "unit": "GCUPS",
        "vs_baseline": 0,
        "error": "TPU backend unavailable after 3 attempts "
                 "(see BENCH_NOTES.md for the last measured numbers)",
    }))
    return 1


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        sys.exit(supervised())
