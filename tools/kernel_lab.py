"""Kernel experiment harness: time DP / traceback variants on the chip.

Usage: python tools/kernel_lab.py [exp ...]   (default: base)

Each experiment times V chained invocations of one component at the
bench shape (B=2048, T=320) with a device_get fence (the only reliable
fence over the axon relay) and prints ms/step.  Used to attribute the
step time between the Pallas DP kernel and the traceback walk, and to
measure candidate optimizations before they land in ops/.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

B = int(os.environ.get("KL_B", 2048))
T = int(os.environ.get("KL_T", 320))
ET = int(os.environ.get("KL_ET", 200))
V = int(os.environ.get("KL_V", 16))


def make_inputs(rng):
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = alpha[rng.integers(0, 4, size=(V, B, T))]
    queries = refs.copy()
    mut = rng.random((V, B, T)) < 0.1
    queries[mut] = alpha[rng.integers(0, 4, size=int(mut.sum()))]
    return refs, queries


def bench(fn, *args, reps=3):
    import jax
    jfn = jax.jit(fn)
    sink = jax.device_get(jfn(*args))
    t0 = time.time()
    for _ in range(reps):
        sink = jax.device_get(jfn(*args))
    dt = (time.time() - t0) / reps
    return dt, sink


def main() -> None:
    import jax
    import jax.numpy as jnp

    from darwin_tpu.ops.pallas_dp import align_tiles_pallas
    from darwin_tpu.ops.traceback import traceback_jax

    exps = sys.argv[1:] or ["base"]
    rng = np.random.default_rng(0)
    refs, queries = make_inputs(rng)
    rlen = np.full(B, T, dtype=np.int32)
    qlen = np.full(B, T, dtype=np.int32)
    firsts = np.zeros(B, dtype=bool)
    firsts[: B // 2] = True
    kw = dict(match=1, mismatch=-1, gap_open=-1, gap_extend=-1)

    refs_d = jax.device_put(refs)
    queries_d = jax.device_put(queries)

    def chain(step):
        def fn(rs, qs):
            def body(c, rq):
                return c + step(*rq), None
            tot, _ = jax.lax.scan(body, jnp.int32(0), (rs, qs))
            return tot
        return fn

    if "base" in exps or "dp" in exps:
        def dp_only(r, q):
            out = align_tiles_pallas(r, q, rlen, qlen, block_b=128, **kw)
            return (out["dir"].astype(jnp.int32)[:, ::64, ::64].sum()
                    + out["max_score"].sum())
        dt, _ = bench(chain(dp_only), refs_d, queries_d)
        print(f"dp_only: {dt/V*1e3:.2f} ms/step "
              f"({B*T*T*V/dt/1e9:.2f} GCUPS)")

    if "base" in exps or "tb" in exps:
        outs = [align_tiles_pallas(refs_d[i], queries_d[i], rlen, qlen,
                                   block_b=128, **kw) for i in range(V)]
        dirs = jnp.stack([o["dir"] for o in outs])
        mis = jnp.stack([o["max_i"] for o in outs])
        mjs = jnp.stack([o["max_j"] for o in outs])

        def tb_only(d, mi, mj):
            ops, mb, i_s, j_s = traceback_jax(d, rlen, qlen, firsts,
                                              mi, mj,
                                              early_terminate=ET)
            return ops.astype(jnp.int32).sum() + i_s.sum() + j_s.sum()

        def fn(ds, ms, js):
            def body(c, x):
                return c + tb_only(*x), None
            tot, _ = jax.lax.scan(body, jnp.int32(0), (ds, ms, js))
            return tot
        dt, _ = bench(fn, dirs, mis, mjs)
        print(f"tb_only: {dt/V*1e3:.2f} ms/step")

    if "packed" in exps:
        from darwin_tpu.ops.traceback import traceback_packed_jax

        def step_packed(r, q):
            out = align_tiles_pallas(r, q, rlen, qlen, block_b=128,
                                     dir_format="packed", **kw)
            ops, _mb, i_s, j_s = traceback_packed_jax(
                out["dir_words"], rlen, qlen, firsts, out["max_i"],
                out["max_j"], early_terminate=ET)
            return (ops.astype(jnp.int32).sum() + i_s.sum() + j_s.sum()
                    + out["max_score"].sum())
        dt, _ = bench(chain(step_packed), refs_d, queries_d)
        print(f"packed full step: {dt/V*1e3:.2f} ms/step "
              f"({B*T*T*V/dt/1e9:.2f} GCUPS)")

    if "packed_dp" in exps:
        def dp_packed(r, q):
            out = align_tiles_pallas(r, q, rlen, qlen, block_b=128,
                                     dir_format="packed", **kw)
            return (out["dir_words"][:, ::64, ::64].sum()
                    + out["max_score"].sum())
        dt, _ = bench(chain(dp_packed), refs_d, queries_d)
        print(f"packed dp_only: {dt/V*1e3:.2f} ms/step")

    if "byte_full" in exps:
        def step_byte(r, q):
            out = align_tiles_pallas(r, q, rlen, qlen, block_b=128, **kw)
            ops, _mb, i_s, j_s = traceback_jax(
                out["dir"], rlen, qlen, firsts, out["max_i"],
                out["max_j"], early_terminate=ET)
            return (ops.astype(jnp.int32).sum() + i_s.sum() + j_s.sum()
                    + out["max_score"].sum())
        dt, _ = bench(chain(step_byte), refs_d, queries_d)
        print(f"byte full step: {dt/V*1e3:.2f} ms/step "
              f"({B*T*T*V/dt/1e9:.2f} GCUPS)")

    if "packed6" in exps:
        from darwin_tpu.ops.traceback import traceback_packed6_jax

        def step_p6(r, q):
            out = align_tiles_pallas(r, q, rlen, qlen, block_b=128,
                                     dir_format="packed6", **kw)
            ops, _mb, i_s, j_s = traceback_packed6_jax(
                out["dir_words"], rlen, qlen, firsts, out["max_i"],
                out["max_j"], early_terminate=ET)
            return (ops.astype(jnp.int32).sum() + i_s.sum() + j_s.sum()
                    + out["max_score"].sum())
        dt, _ = bench(chain(step_p6), refs_d, queries_d)
        print(f"packed6 full step: {dt/V*1e3:.2f} ms/step "
              f"({B*T*T*V/dt/1e9:.2f} GCUPS)", flush=True)

        def dp_p6(r, q):
            out = align_tiles_pallas(r, q, rlen, qlen, block_b=128,
                                     dir_format="packed6", **kw)
            return (out["dir_words"][:, ::64, ::64].sum()
                    + out["max_score"].sum())
        dt, _ = bench(chain(dp_p6), refs_d, queries_d)
        print(f"packed6 dp_only: {dt/V*1e3:.2f} ms/step", flush=True)

    if "p6compact" in exps:
        # ET-early-drop via lane compaction: once <= compact_b walkers
        # survive, the tail runs at compact_b gather lanes instead of B.
        from darwin_tpu.ops.traceback import traceback_packed6_jax

        for KB in (0, 64, 128, 256, 512):
            def step_c(r, q, KB=KB):
                out = align_tiles_pallas(r, q, rlen, qlen, block_b=128,
                                         dir_format="packed6", **kw)
                ops, _mb, i_s, j_s = traceback_packed6_jax(
                    out["dir_words"], rlen, qlen, firsts, out["max_i"],
                    out["max_j"], early_terminate=ET, compact_b=KB)
                return (ops.astype(jnp.int32).sum() + i_s.sum()
                        + j_s.sum() + out["max_score"].sum())
            dt, _ = bench(chain(step_c), refs_d, queries_d)
            print(f"packed6 compact_b={KB}: {dt/V*1e3:.2f} ms/step "
                  f"({B*T*T*V/dt/1e9:.2f} GCUPS)", flush=True)

    if "tbunroll" in exps:
        from darwin_tpu.ops.traceback import traceback_packed_jax

        # Amortize the ~18.5us fixed while_loop cost over 2U steps.
        for U in (1, 2, 4, 8):
            def step_u(r, q, U=U):
                out = align_tiles_pallas(r, q, rlen, qlen, block_b=128,
                                         dir_format="packed", **kw)
                ops, _mb, i_s, j_s = traceback_packed_jax(
                    out["dir_words"], rlen, qlen, firsts, out["max_i"],
                    out["max_j"], early_terminate=ET, unroll=U)
                return (ops.astype(jnp.int32).sum() + i_s.sum()
                        + j_s.sum() + out["max_score"].sum())
            dt, _ = bench(chain(step_u), refs_d, queries_d)
            print(f"packed step tb-unroll={U}: {dt/V*1e3:.2f} ms/step "
                  f"({B*T*T*V/dt/1e9:.2f} GCUPS)")

    if "ilp" in exps:
        # VPU latency-vs-throughput probe: interleave N independent
        # batch sub-blocks inside the unrolled 8-row body so one
        # stream's work can fill another's serial shift-max latency.
        # If ms/step drops with interleave>1, the kernel was
        # latency-bound and the BASELINE.md "ALU floor" is not a floor.
        for il in (1, 2, 4):
            def dp_il(r, q, il=il):
                out = align_tiles_pallas(r, q, rlen, qlen, block_b=128,
                                         dir_format="packed",
                                         interleave=il, **kw)
                return (out["dir_words"][:, ::64, ::64].sum()
                        + out["max_score"].sum())
            dt, _ = bench(chain(dp_il), refs_d, queries_d)
            print(f"packed dp interleave={il}: {dt/V*1e3:.2f} ms/step "
                  f"({B*T*T*V/dt/1e9:.2f} GCUPS)")

    if "tbiters" in exps:
        # How many while_loop iterations does the walk actually run?
        out = align_tiles_pallas(refs_d[0], queries_d[0], rlen, qlen,
                                 block_b=128, **kw)
        ops, mb, i_s, j_s = traceback_jax(
            out["dir"], rlen, qlen, firsts, out["max_i"], out["max_j"],
            early_terminate=ET)
        ops = np.asarray(jax.device_get(ops))
        used = (ops != 0).any(axis=1)
        print(f"tb iterations used: {int(used.sum())} / {ops.shape[0]}"
              f"  (mean steps/tile "
              f"{float((ops != 0).sum(0).mean()):.1f})")


if __name__ == "__main__":
    main()
