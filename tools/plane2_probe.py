"""Second-word-plane traceback: decision probe (ROADMAP perf #2 tail).

The remaining named traceback idea packs deeper diagonal cells into a
SECOND int32 word plane so a match-run walker could advance up to ~7
steps per gather round instead of packed6's 2-4.  Whether it can win
reduces to two atomic measurements (run each in its own process —
kernel variants are isolated per CLAUDE.md):

  gather : cost of widening the walker's dependent gather — [B,1]
           vs [B,2] (both planes, interleaved last dim) vs two
           independent [B,1] gathers per iteration, all chained so
           each iteration depends on the previous (the real walker's
           structure, cf. tools/tb_exp.py).
  emit   : DP-side cost of producing the extra plane — the production
           packed6 kernel (imported math, bit-exact) plus 3 extra aged
           history registers and a second [BB, 8, TJP] int32 output
           (representative +6 ops/row and +4 bytes/cell writeback).

Decision arithmetic (written to BENCH_NOTES): the idea wins only if
  (traceback_ms) * (1 - gather_cost_ratio * steps_now / steps_plane2)
exceeds the measured DP emission overhead.

Usage: python tools/plane2_probe.py {gather|emit} [T]
"""

from __future__ import annotations

import sys
import time

import numpy as np

B = 2048
V = 8
INTERPRET = False  # set by PROBE_CPU smoke mode


def bench(fn, *args, reps=3):
    import jax
    jfn = jax.jit(fn)
    sink = jax.device_get(jfn(*args))
    t0 = time.time()
    for _ in range(reps):
        sink = jax.device_get(jfn(*args))
    return (time.time() - t0) / reps, sink


def probe_gather(T: int) -> None:
    """Chained dependent gathers at the walker's shape: one plane
    [B,1], both planes via one [B,2] take_along_axis (interleaved
    [.., 2] layout), and two separate [B,1] gathers per iteration."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    C = -(-(T + 1) // 128) * 128
    ITERS = 45  # measured packed6 walker rounds at the bench shape
    # One copy of each layout (the [.., 2] interleaved plane pair is
    # 2.4 GB at T=376); the V chained walks start at different
    # offsets so each scan step's gather chain is distinct.
    flat1 = jnp.asarray(rng.integers(0, 1 << 30, size=(B, T * C),
                                     dtype=np.int32))
    flat2 = jnp.asarray(rng.integers(0, 1 << 30, size=(B, T * C, 2),
                                     dtype=np.int32))

    def walk(mode):
        def fn(f1, f2):
            d2f = f2.reshape(B, T * C * 2)

            def body(acc, seed):
                def step(c):
                    s, val, idx = c
                    nidx = (idx + (val & 7) + 1) % (T * C - 2)
                    if mode == "one":
                        v = jnp.take_along_axis(f1, nidx[:, None],
                                                axis=1)[:, 0]
                    elif mode == "wide2":
                        base = nidx * 2
                        ii = jnp.stack([base, base + 1], axis=1)
                        pair = jnp.take_along_axis(d2f, ii, axis=1)
                        v = pair[:, 0] ^ pair[:, 1]
                    else:  # two separate [B,1] gathers
                        va = jnp.take_along_axis(f1, nidx[:, None],
                                                 axis=1)[:, 0]
                        vb = jnp.take_along_axis(
                            f1, ((nidx + 7) % (T * C))[:, None],
                            axis=1)[:, 0]
                        v = va ^ vb
                    return (s + 1, v, nidx)

                def cond(c):
                    return c[0] < ITERS

                i0 = ((jnp.arange(B, dtype=jnp.int32) + seed * 131)
                      % (T * C))
                c = (jnp.int32(0), jnp.zeros(B, jnp.int32), i0)
                c = jax.lax.while_loop(cond, step, c)
                return acc + c[1].sum(), None

            tot, _ = jax.lax.scan(body, jnp.int32(0),
                                  jnp.arange(V, dtype=jnp.int32))
            return tot
        return fn

    for mode in ("one", "wide2", "twosep"):
        dt, _ = bench(walk(mode), flat1, flat2)
        per = dt / V / ITERS * 1e6
        print(f"gather {mode}: {dt/V*1e3:.2f} ms/walk "
              f"({per:.1f} us/iter)", flush=True)


def probe_emit(T: int) -> None:
    """Production packed6 DP kernel vs the same kernel + a second
    emitted plane (3 extra aged registers, same math imported from
    ops.pallas_dp so the base path is bit-identical)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from darwin_tpu.ops.pallas_dp import (ROWS_PER_STEP, _N_STATE,
                                          _make_kernel, _score_dtype,
                                          _state_keys, _tile_math)
    from darwin_tpu.ops.common import PAD_QUERY
    from darwin_tpu.utils import round_up

    kw = dict(match=1, mismatch=-1, gap_open=-1, gap_extend=-1)
    TJP = round_up(T + 1, 128)
    sdt, neg_inf = _score_dtype(T, **kw)
    BB = 128
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = alpha[rng.integers(0, 4, size=(V, B, T))]
    queries = refs.copy()
    mut = rng.random((V, B, T)) < 0.1
    queries[mut] = alpha[rng.integers(0, 4, size=int(mut.sum()))]
    rlen = jnp.full((B, 1), T, jnp.int32)
    qlen = jnp.full((B, 1), T, jnp.int32)

    make_sv, init_state, row_update, finalize = _tile_math(
        T, TJP, kw["match"], kw["mismatch"], kw["gap_open"],
        kw["gap_extend"], sdt, neg_inf, "packed6")
    keys = _state_keys("packed6")
    n_row_blocks = T // ROWS_PER_STEP

    def kernel2(refT_ref, query_ref, rlen_ref, qlen_ref,
                dir_ref, dir2_ref, stats_ref, *scratch):
        ib = pl.program_id(1)
        base, extra = scratch[: len(keys)], scratch[len(keys):]
        lane = jax.lax.broadcasted_iota(jnp.int32, (BB, TJP),
                                        1).astype(sdt)

        @pl.when(ib == 0)
        def _init():
            st0 = init_state(query_ref[:])
            for k, ref in zip(keys, base):
                ref[:] = st0[k]
            for ref in extra:
                ref[:] = jnp.zeros((BB, TJP), jnp.int32)

        sv = make_sv(lane, base[2][:], rlen_ref[:].astype(sdt),
                     qlen_ref[:].astype(sdt),
                     {k: ref[:] for k, ref in zip(keys, base)
                      if k != "qs"})
        d2a, d2b, d2c = (extra[0][:], extra[1][:], extra[2][:])
        rc8 = refT_ref[:].astype(sdt).T

        def shr(x):
            head = jnp.zeros((x.shape[0], 1), x.dtype)
            return jnp.concatenate([head, x[:, :-1]], axis=1)

        for r in range(ROWS_PER_STEP):
            rcb = jnp.broadcast_to(rc8[:, r: r + 1], (BB, TJP))
            old_c1c = sv["c1c"]
            dir_ref[:, r, :] = row_update(
                sv, ib * ROWS_PER_STEP + r, rcb)
            # Second plane: 3 deeper aged diagonal cells
            # (representative alignment; +6 ops/row + writeback).
            dir2_ref[:, r, :] = d2a + (d2b << 5) + (shr(d2c) << 10)
            d2a, d2b, d2c = shr(old_c1c), d2a, d2b

        for k, ref in zip(keys, base):
            if k != "qs":
                ref[:] = sv[k]
        for ref, v in zip(extra, (d2a, d2b, d2c)):
            ref[:] = v

        @pl.when(ib == n_row_blocks - 1)
        def _finalize():
            score, bi, bj, pos = finalize(sv["bh"], sv["bi"],
                                          sv["ph"], qlen_ref[:]
                                          .astype(sdt))
            stats_ref[:, 0:1] = score
            stats_ref[:, 1:2] = bi
            stats_ref[:, 2:3] = bj
            stats_ref[:, 3:4] = pos

    n_hist = 4
    scratch = [pltpu.VMEM((BB, TJP), sdt) for _ in range(_N_STATE)]
    scratch += [pltpu.VMEM((BB, TJP), jnp.int32)
                for _ in range(n_hist + 3)]
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    @jax.jit
    def plane2(ref, query):
        refT = ref.T
        qp = jnp.pad(query, ((0, 0), (0, TJP - T)),
                     constant_values=PAD_QUERY)
        d1, d2, st = pl.pallas_call(
            kernel2,
            grid=(B // BB, n_row_blocks),
            in_specs=[
                pl.BlockSpec((ROWS_PER_STEP, BB), lambda b, i: (i, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BB, TJP), lambda b, i: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BB, 1), lambda b, i: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BB, 1), lambda b, i: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((BB, ROWS_PER_STEP, TJP),
                             lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BB, ROWS_PER_STEP, TJP),
                             lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BB, 4), lambda b, i: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, T, TJP), jnp.int32),
                jax.ShapeDtypeStruct((B, T, TJP), jnp.int32),
                jax.ShapeDtypeStruct((B, 4), jnp.int32),
            ],
            scratch_shapes=scratch,
            compiler_params=cp,
            interpret=INTERPRET,
        )(refT, qp, rlen, qlen)
        return (d1[:, ::64, ::64].sum() + d2[:, ::64, ::64].sum()
                + st[:, 0].sum())

    from darwin_tpu.ops.pallas_dp import align_tiles_pallas

    @jax.jit
    def base_fn(ref, query):
        out = align_tiles_pallas(ref, query, rlen[:, 0], qlen[:, 0],
                                 block_b=BB, dir_format="packed6",
                                 interpret=INTERPRET, **kw)
        return (out["dir_words"][:, ::64, ::64].sum()
                + out["max_score"].sum())

    def chain(step):
        def fn(rs, qs):
            def body(acc, rq):
                return acc + step(*rq), None
            tot, _ = jax.lax.scan(body, jnp.int32(0), (rs, qs))
            return tot
        return fn

    refs_d = jax.device_put(jnp.asarray(refs))
    queries_d = jax.device_put(jnp.asarray(queries))
    for name, fn in (("packed6 base", base_fn),
                     ("packed6+plane2", plane2)):
        dt, _ = bench(chain(fn), refs_d, queries_d)
        print(f"emit {name}: T={T} {dt/V*1e3:.2f} ms/step "
              f"({B*T*T*V/dt/1e9:.2f} GCUPS)", flush=True)


def main() -> int:
    import os
    global B, V, INTERPRET
    if os.environ.get("PROBE_CPU"):  # tiny CPU smoke (JAX_PLATFORMS
        # env is ignored in-process on this image; see CLAUDE.md)
        import jax
        jax.config.update("jax_platforms", "cpu")
        B, V, INTERPRET = 256, 2, True
    which = sys.argv[1] if len(sys.argv) > 1 else "gather"
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 376
    if which == "gather":
        probe_gather(T)
    elif which == "emit":
        probe_emit(T)
    else:
        raise SystemExit(f"unknown probe {which}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
