"""Compiled-path Pallas coverage sweep on real TPU hardware.

Runs the GACT tile kernel COMPILED (not interpret) across a matrix of
(B, T, block_b, dir_format, interleave) geometries and differentially
checks every output against the pure-JAX reference DP evaluated on the
host CPU backend in the same process.  One config per child process so
a Mosaic hardware abort (see docs/ROADMAP.md) cannot take the sweep
down or wedge later configs, and each crash is attributable.

Usage:
  python tools/geom_sweep.py            # run the default matrix
  python tools/geom_sweep.py one B T BB FMT IL   # one config (child)
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

# (B, T, block_b, dir_format, interleave): production geometry first,
# then the block/tile variants the engine's buckets can select, the
# byte-dir format, and the ILP streams kernel.
DEFAULT_MATRIX = [
    (512, 320, 128, "packed6", 1),
    (256, 320, 128, "packed6", 1),
    (512, 128, 128, "packed6", 1),
    (256, 512, 128, "packed6", 1),
    (256, 320, 256, "packed6", 1),
    # block_b == B (full-array block): the geometry the two-tier
    # drain's small-B straggler engine compiles.  block_b < B needs
    # block_b % 128 == 0 on hardware (align_tiles_pallas validates).
    (32, 320, 32, "packed6", 1),
    (256, 320, 128, "packed", 1),
    (256, 320, 128, "bytes", 1),
    # interleave streams need block_b >= 128*N (per-stream (8, H)
    # transposed-ref blocks must keep H a multiple of 128 on hardware).
    (512, 320, 256, "packed6", 2),
]


def run_one(B: int, T: int, bb: int, fmt: str, il: int) -> int:
    import jax
    import jax.numpy as jnp

    from darwin_tpu.ops.pallas_dp import align_tiles_pallas
    from darwin_tpu.ops.reference_dp import align_tiles_jax
    from darwin_tpu.ops.traceback import pack_dir_words, pack_dir_words6

    rng = np.random.default_rng(B * 31 + T)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = alpha[rng.integers(0, 4, size=(B, T))]
    query = ref.copy()
    mut = rng.random((B, T)) < 0.12
    query[mut] = alpha[rng.integers(0, 4, size=int(mut.sum()))]
    rlen = rng.integers(T // 2, T + 1, size=B).astype(np.int32)
    qlen = rng.integers(T // 2, T + 1, size=B).astype(np.int32)
    kw = dict(match=1, mismatch=-1, gap_open=-1, gap_extend=-1)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        want = {k: np.asarray(v) for k, v in align_tiles_jax(
            ref, query, rlen, qlen, **kw).items()}

    t0 = time.time()
    got = align_tiles_pallas(ref, query, rlen, qlen, block_b=bb,
                             dir_format=fmt, interleave=il, **kw)
    got = {k: jax.device_get(v) for k, v in got.items()}
    wall = time.time() - t0

    for k in ("max_score", "max_i", "max_j", "pos_score"):
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    TJ = want["dir"].shape[2]
    if fmt == "bytes":
        np.testing.assert_array_equal(got["dir"][:, :, :TJ],
                                      want["dir"])
    else:
        packer = pack_dir_words if fmt == "packed" else pack_dir_words6
        np.testing.assert_array_equal(
            got["dir_words"][:, :, :TJ], np.asarray(packer(want["dir"])))
    print(f"OK B={B} T={T} bb={bb} fmt={fmt} il={il} "
          f"(compile+run {wall:.1f}s)", flush=True)
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        B, T, bb = (int(x) for x in sys.argv[2:5])
        fmt, il = sys.argv[5], int(sys.argv[6])
        return run_one(B, T, bb, fmt, il)

    results = []
    for B, T, bb, fmt, il in DEFAULT_MATRIX:
        cmd = [sys.executable, __file__, "one", str(B), str(T),
               str(bb), fmt, str(il)]
        t0 = time.time()
        try:
            p = subprocess.run(cmd, timeout=900)
            status = "ok" if p.returncode == 0 else f"rc={p.returncode}"
        except subprocess.TimeoutExpired:
            status = "timeout"
        results.append((B, T, bb, fmt, il, status, time.time() - t0))
        print(f"[sweep] B={B} T={T} bb={bb} fmt={fmt} il={il}: "
              f"{status} ({results[-1][-1]:.0f}s)", flush=True)
        if status != "ok":
            # A hardware abort wedges the tunnel grant for a while;
            # give the next config a chance to get a fresh one.
            print("[sweep] non-ok config; pausing 120 s before the "
                  "next (stale-grant cooldown)", flush=True)
            time.sleep(120)
    bad = [r for r in results if r[5] != "ok"]
    print(f"[sweep] {len(results) - len(bad)}/{len(results)} configs "
          f"exact; failures: {bad if bad else 'none'}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
