"""Validate the Pallas kernel on real TPU hardware and measure GCUPS.

Usage: python tools/tpu_check.py [B] [T] [block_b]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from darwin_tpu.ops.pallas_dp import align_tiles_pallas
from darwin_tpu.ops.reference_dp import align_tiles_jax
from darwin_tpu.ops.traceback import (pack_dir_words, traceback_jax,
                                      traceback_packed_jax,
                                      pack_dir_words6,
                                      traceback_packed6_jax)


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    block_b = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    print("backend:", jax.default_backend(), jax.devices())

    from tests.test_dp import make_batch
    rng = np.random.default_rng(0)
    ref, query, rlen, qlen = make_batch(rng, B, T)
    kw = dict(match=1, mismatch=-1, gap_open=-1, gap_extend=-1)

    t0 = time.time()
    got = jax.block_until_ready(align_tiles_pallas(
        ref, query, rlen, qlen, block_b=block_b, **kw))
    print(f"pallas compile+run: {time.time()-t0:.1f}s")

    # Parity vs the lax formulation on a slice (lax on TPU is slow but
    # correct; keep the slice small).
    nb = min(B, 64)
    want = jax.block_until_ready(align_tiles_jax(
        ref[:nb], query[:nb], rlen[:nb], qlen[:nb], **kw))
    ok = True
    for k in ("max_score", "max_i", "max_j", "pos_score"):
        if not np.array_equal(np.asarray(got[k])[:nb], np.asarray(want[k])):
            print("MISMATCH", k)
            ok = False
    gd = np.asarray(got["dir"])[:nb, :, : want["dir"].shape[2]]
    if not np.array_equal(gd, np.asarray(want["dir"])):
        bad = np.argwhere(gd != np.asarray(want["dir"]))
        print("MISMATCH dir", bad[:5], gd.shape)
        ok = False
    print("parity on", nb, "tiles:", "OK" if ok else "FAIL")

    # Traceback on TPU: byte walk, plus the packed production walk
    # which must agree bit-for-bit.
    first = np.ones(B, dtype=bool)
    t0 = time.time()
    ops, _mb, i_s, j_s = jax.block_until_ready(traceback_jax(
        got["dir"], rlen, qlen, first, got["max_i"], got["max_j"],
        early_terminate=200))
    print(f"traceback compile+run: {time.time()-t0:.1f}s")
    p_ops, p_mb, p_is, p_js = jax.block_until_ready(
        traceback_packed_jax(pack_dir_words(got["dir"]), rlen, qlen,
                             first, got["max_i"], got["max_j"],
                             early_terminate=200))
    pok = (np.array_equal(np.asarray(ops), np.asarray(p_ops))
           and np.array_equal(np.asarray(i_s), np.asarray(p_is))
           and np.array_equal(np.asarray(j_s), np.asarray(p_js)))
    print("packed traceback parity:", "OK" if pok else "FAIL")

    # packed6 production walk: same op SUBSEQUENCE (its layout holes
    # are trailing group slots) and identical step counts.
    p6 = jax.block_until_ready(
        traceback_packed6_jax(pack_dir_words6(got["dir"]), rlen, qlen,
                              first, got["max_i"], got["max_j"],
                              early_terminate=200))
    o6 = np.asarray(p6[0])
    oref = np.asarray(ops)
    sub_ok = all(
        np.array_equal(oref[oref[:, b] != 0, b], o6[o6[:, b] != 0, b])
        for b in range(oref.shape[1]))
    p6ok = (sub_ok
            and np.array_equal(np.asarray(i_s), np.asarray(p6[2]))
            and np.array_equal(np.asarray(j_s), np.asarray(p6[3])))
    print("packed6 traceback parity:", "OK" if p6ok else "FAIL")

    # Timing
    for name, fn in [
        ("dp", lambda: align_tiles_pallas(ref, query, rlen, qlen,
                                          block_b=block_b, **kw)),
        ("traceback", lambda: traceback_jax(
            got["dir"], rlen, qlen, first, got["max_i"], got["max_j"],
            early_terminate=200)),
    ]:
        jax.block_until_ready(fn())
        n = 5
        t0 = time.time()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / n
        cells = float(np.sum(rlen.astype(np.int64) * qlen))
        if name == "dp":
            print(f"{name}: {dt*1e3:.2f} ms  "
                  f"{cells/dt/1e9:.1f} GCUPS (true cells), "
                  f"{B*T*T/dt/1e9:.1f} GCUPS (padded)")
        else:
            print(f"{name}: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
