"""Scan-shift lowering probe: concat-shift vs pltpu.roll+mask.

The DP kernel's in-row query-gap cummax is a 9-step shift-max scan on
[BB, TJP] int32 (18 of the ~56 VPU ops/row — the single largest term,
ops/pallas_dp.py row_update).  Each step's lane shift is built as
`concat([fill, x[:, :-s]])`; `pltpu.roll` (static lane rotate, proven
on this chip in ops/tile_fetch.py) plus an iota mask is the only
alternative lowering.  This probe times both scan implementations in
an otherwise identical Pallas kernel so the cheaper lowering is a
measurement, not a guess.

Usage: python tools/scanshift_probe.py [T]   (default 376)
"""

from __future__ import annotations

import sys
import time

import numpy as np

B = 2048
BB = 128
V = 8
STEPS = 16  # scan applications per grid step (amplifies the signal)
INTERPRET = False


def bench(fn, *args, reps=3):
    import jax
    jfn = jax.jit(fn)
    sink = jax.device_get(jfn(*args))
    t0 = time.time()
    for _ in range(reps):
        sink = jax.device_get(jfn(*args))
    return (time.time() - t0) / reps, sink


def main() -> int:
    import os
    global B, V, INTERPRET
    if os.environ.get("PROBE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
        B, V, INTERPRET = 256, 2, True
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 376
    TJP = -(-(T + 1) // 128) * 128

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NEG = -(1 << 30)

    def make_kernel(mode):
        def scan_concat(u):
            s = 1
            while s < TJP:
                head = jnp.full((BB, s), NEG, jnp.int32)
                u = jnp.maximum(
                    u, jnp.concatenate([head, u[:, :-s]], axis=1))
                s *= 2
            return u

        lane = None

        def scan_roll(u, lane):
            s = 1
            while s < TJP:
                r = pltpu.roll(u, s, 1)
                u = jnp.maximum(u, jnp.where(lane >= s, r, NEG))
                s *= 2
            return u

        def kernel(x_ref, o_ref):
            lane = jax.lax.broadcasted_iota(jnp.int32, (BB, TJP), 1)
            u = x_ref[:]
            for i in range(STEPS):
                # Data-dependent perturbation so the scans cannot fuse
                # away across iterations.
                u = u + i
                u = (scan_concat(u) if mode == "concat"
                     else scan_roll(u, lane))
            o_ref[:] = u
        return kernel

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-1000, 1000, size=(V, B, TJP),
                                 dtype=np.int32))

    for mode in ("concat", "roll"):
        kernel = make_kernel(mode)

        @jax.jit
        def one(xx, kernel=kernel):
            return pl.pallas_call(
                kernel,
                grid=(B // BB,),
                in_specs=[pl.BlockSpec((BB, TJP), lambda b: (b, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((BB, TJP), lambda b: (b, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, TJP), jnp.int32),
                interpret=INTERPRET,
            )(xx)

        def chain(xs):
            def body(acc, xv):
                return acc + one(xv).sum(), None
            tot, _ = jax.lax.scan(body, jnp.int64(0)
                                  if False else jnp.int32(0), xs)
            return tot

        dt, sink = bench(chain, x)
        n_scans = V * (B // BB) * STEPS
        print(f"{mode}: {dt*1e3:.2f} ms total = "
              f"{dt/n_scans*1e6:.2f} us per [128,{TJP}] 9-step scan "
              f"(sink {int(sink) & 0xffff})", flush=True)

    # Correctness cross-check (tiny): both scans must agree.
    u0 = jnp.asarray(rng.integers(-50, 50, size=(BB, TJP),
                                  dtype=np.int32))
    lane = jax.lax.broadcasted_iota(jnp.int32, (BB, TJP), 1)

    def host_scan_concat(u):
        s = 1
        while s < TJP:
            head = jnp.full((BB, s), NEG, jnp.int32)
            u = jnp.maximum(u, jnp.concatenate([head, u[:, :-s]],
                                               axis=1))
            s *= 2
        return u

    def host_scan_mask(u):
        s = 1
        while s < TJP:
            r = jnp.roll(u, s, axis=1)
            u = jnp.maximum(u, jnp.where(lane >= s, r, NEG))
            s *= 2
        return u

    a = np.asarray(host_scan_concat(u0))
    b = np.asarray(host_scan_mask(u0))
    assert (a == b).all(), "roll+mask scan diverges from concat scan"
    print("scan variants agree (host cross-check)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
