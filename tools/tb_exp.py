"""Traceback iteration-cost decomposition experiments (scratch tool).

Times stripped-down variants of the traceback while_loop body to
attribute per-iteration cost between the [B] gather, the op recording
scatter, and the elementwise state logic.
"""

from __future__ import annotations

import sys
import time

import numpy as np

B, T, ET, V = 2048, 320, 200, 8


def bench(fn, *args, reps=3):
    import jax
    jfn = jax.jit(fn)
    sink = jax.device_get(jfn(*args))
    t0 = time.time()
    for _ in range(reps):
        sink = jax.device_get(jfn(*args))
    return (time.time() - t0) / reps, sink


def main() -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    C = 384
    dirs = jnp.asarray(rng.integers(0, 32, size=(V, B, T, C),
                                    dtype=np.uint8))
    i0 = jnp.full((B,), T, jnp.int32)
    j0 = jnp.full((B,), T, jnp.int32)
    S = 2 * ET - 1

    def walk(flat, record, gather, logic):
        def cell(i, j):
            idx = jnp.clip(i - 1, 0, T - 1) * C + jnp.clip(j, 0, C - 1)
            v = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
            return v.astype(jnp.int32)

        def cond(c):
            s = c[0]
            return s < 204

        def step(c):
            s, ops, val, i, j = c
            if record:
                ops = ops.at[s].set((val & 3).astype(jnp.uint8))
            if logic:
                st = val % 4
                di = jnp.where(st == 3, 1, jnp.where(st == 2, 1, 0))
                dj = jnp.where(st == 3, 1, jnp.where(st == 2, 0, 1))
            else:
                di = 1
                dj = 1
            ni, nj = i - di, j - dj
            nval = cell(ni, nj) if gather else (val + 1)
            return (s + 1, ops, nval, ni, nj)

        ops0 = jnp.zeros((S, B), jnp.uint8)
        c = (jnp.int32(0), ops0, cell(i0, j0), i0, j0)
        c = jax.lax.while_loop(cond, step, c)
        return c[1].astype(jnp.int32).sum() + c[3].sum()

    def chain(record, gather, logic):
        def fn(ds):
            def body(acc, d):
                return acc + walk(d.reshape(B, T * C), record, gather,
                                  logic), None
            tot, _ = jax.lax.scan(body, jnp.int32(0), ds)
            return tot
        return fn

    sel = sys.argv[1:] or ["full", "no-record", "no-gather"]
    allv = {
        "full": (True, True, True),
        "no-record": (False, True, True),
        "no-gather": (True, False, True),
        "no-logic": (True, True, False),
        "bare-gather": (False, True, False),
        "empty": (False, False, False),
    }
    for name in sel:
        r, g, lg = allv[name]
        dt, _ = bench(chain(r, g, lg), dirs)
        print(f"{name}: {dt/V*1e3:.2f} ms/step "
              f"({dt/V/204*1e6:.1f} us/iter)")


if __name__ == "__main__":
    main()
