"""Compile-cost evidence: does the persistent JAX cache amortize the
cold start across process restarts, and what would AOT export buy?

Three measurements (CPU backend — deterministic and relay-independent;
the tunnel-TPU caveat is documented in BENCH_NOTES.md):

1. restart wall: run the CLI on the tiny fixture with --engine device
   and --jax-cache in three fresh processes against the same cache dir
   (run 1 = cold populate, runs 2-3 = should hit the persistent cache)
   plus one run with no cache flag, and report the walls.
2. trace/lower vs backend-compile split of the device-engine function
   (jax.jit(...).lower() time vs .compile() time): jax.export ships
   the lowered StableHLO, so "lower" is the most AOT export could
   save — the backend compile (the dominant cost, and the part the
   tunnel pays remotely) still runs on import unless the persistent
   cache covers it.
3. jax.export round-trip of the bench-shape Pallas DP step: serialize,
   deserialize, and compile-call the restored function, timing each.

Usage: python tools/compile_cost.py [--workdir /tmp/compile_cost]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def cli_wall(workdir: Path, cache: Path | None, tag: str) -> float:
    d = REPO / "tests" / "data" / "tiny"
    out = workdir / tag
    out.mkdir(parents=True, exist_ok=True)
    env = {"PYTHONPATH": str(REPO), "PATH": os.environ["PATH"],
           "JAX_PLATFORMS": "cpu", "HOME": os.environ["HOME"]}
    cmd = [sys.executable, "-m", "darwin_tpu.cli",
           str(d / "reads.fasta"), str(d / "reads.fasta"),
           "--params", str(d / "params.cfg"), "--batch-size", "64",
           "--engine", "device", "--backend", "lax",
           "--out-dir", str(out),
           "--merged-out", str(out / "merged.out")]
    if cache is not None:
        cmd += ["--jax-cache", str(cache)]
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=out, timeout=1200)
    wall = time.time() - t0
    if r.returncode != 0:
        raise SystemExit(f"{tag} failed:\n{r.stderr[-2000:]}")
    want = sorted(set((d / "out.darwin").read_text().splitlines()))
    got = (out / "merged.out").read_text().splitlines()
    assert got == want, f"{tag}: output mismatch"
    return wall


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/compile_cost")
    args = ap.parse_args(argv)
    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    cache = work / "jaxcache"

    w_nocache = cli_wall(work, None, "nocache")
    w_cold = cli_wall(work, cache, "cold")
    w_warm1 = cli_wall(work, cache, "warm1")
    w_warm2 = cli_wall(work, cache, "warm2")
    n_entries = len(list(cache.iterdir())) if cache.exists() else 0
    print(f"CLI tiny fixture, --engine device, fresh process each:")
    print(f"  no cache flag:        {w_nocache:.1f} s")
    print(f"  --jax-cache cold:     {w_cold:.1f} s "
          f"({n_entries} cache entries written)")
    print(f"  --jax-cache restart1: {w_warm1:.1f} s")
    print(f"  --jax-cache restart2: {w_warm2:.1f} s")

    # Trace/lower vs backend-compile split for the bench-shape step.
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from darwin_tpu.ops.reference_dp import align_tiles_jax
    from darwin_tpu.ops.traceback import (pack_dir_words,
                                          traceback_packed_jax)

    B, T, ET = 256, 320, 200
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = alpha[rng.integers(0, 4, (B, T))]
    q = ref.copy()
    rlen = np.full(B, T, np.int32)
    firsts = np.zeros(B, bool)

    def step(r, qq):
        out = align_tiles_jax(r, qq, rlen, rlen, match=1, mismatch=-1,
                              gap_open=-1, gap_extend=-1)
        ops, _m, i_s, j_s = traceback_packed_jax(
            pack_dir_words(out["dir"]), rlen, rlen, firsts,
            out["max_i"], out["max_j"], early_terminate=ET)
        return ops.astype(jnp.int32).sum() + i_s.sum() + j_s.sum()

    t0 = time.time()
    lowered = jax.jit(step).lower(ref, q)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(f"step fn ({B}x{T}): lower {t_lower:.2f} s, "
          f"backend compile {t_compile:.2f} s "
          f"(AOT export can only save the lower part)")

    # jax.export round-trip.
    from jax import export as jexport
    t0 = time.time()
    exported = jexport.export(jax.jit(step))(
        jax.ShapeDtypeStruct((B, T), jnp.uint8),
        jax.ShapeDtypeStruct((B, T), jnp.uint8))
    blob = exported.serialize()
    t_ser = time.time() - t0
    t0 = time.time()
    restored = jexport.deserialize(blob)
    t_deser = time.time() - t0
    t0 = time.time()
    _ = jax.jit(restored.call)(ref, q)  # still pays backend compile
    t_call = time.time() - t0
    print(f"jax.export: serialize {t_ser:.2f} s ({len(blob)/1e6:.1f} "
          f"MB), deserialize {t_deser:.2f} s, first call (backend "
          f"compile) {t_call:.2f} s")
    print("conclusion: export removes tracing/lowering only; the "
          "backend compile dominates and is covered (on local "
          "backends) by the persistent cache above")
    del compiled
    return 0


if __name__ == "__main__":
    sys.exit(main())
