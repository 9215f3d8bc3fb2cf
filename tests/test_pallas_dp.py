"""Pallas TPU kernel vs the pure-JAX DP, in interpreter mode on CPU.

Full parity (dir matrix, max cell, scores) on random related tiles.
On real TPU hardware the same comparison runs compiled (see
tools/tpu_check.py and the tpu-marked test below).
"""

import jax
import numpy as np
import pytest

from darwin_tpu.ops.pallas_dp import align_tiles_pallas
from darwin_tpu.ops.reference_dp import align_tiles_jax

from tests.test_dp import MATCH, MISMATCH, GO, GE, make_batch


def _compare(B, T, seed, block_b, interpret):
    rng = np.random.default_rng(seed)
    ref, query, rlen, qlen = make_batch(rng, B, T)
    want = align_tiles_jax(ref, query, rlen, qlen, match=MATCH,
                           mismatch=MISMATCH, gap_open=GO, gap_extend=GE)
    got = align_tiles_pallas(ref, query, rlen, qlen, match=MATCH,
                             mismatch=MISMATCH, gap_open=GO,
                             gap_extend=GE, block_b=block_b,
                             interpret=interpret)
    for k in ("max_score", "max_i", "max_j", "pos_score"):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)
    wdir = np.asarray(want["dir"])
    gdir = np.asarray(got["dir"])[:, :, : wdir.shape[2]]
    np.testing.assert_array_equal(gdir, wdir)


@pytest.mark.parametrize("B,T,seed,block_b", [
    (8, 24, 0, 8), (16, 40, 1, 8), (8, 24, 2, 4)])
def test_pallas_interpret_matches_jax(B, T, seed, block_b):
    _compare(B, T, seed, block_b, interpret=True)


@pytest.mark.tpu
def test_pallas_tpu_matches_jax():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs TPU")
    _compare(256, 320, 3, 128, interpret=False)


@pytest.mark.parametrize("B,T,seed,block_b", [(8, 24, 0, 8),
                                              (16, 40, 4, 8)])
def test_pallas_interpret_packed_words(B, T, seed, block_b):
    """dir_format='packed' must emit exactly pack_dir_words(dir)."""
    from darwin_tpu.ops.traceback import pack_dir_words

    rng = np.random.default_rng(seed)
    ref, query, rlen, qlen = make_batch(rng, B, T)
    kw = dict(match=MATCH, mismatch=MISMATCH, gap_open=GO, gap_extend=GE,
              block_b=block_b, interpret=True)
    bytes_out = align_tiles_pallas(ref, query, rlen, qlen, **kw)
    packed_out = align_tiles_pallas(ref, query, rlen, qlen,
                                    dir_format="packed", **kw)
    want = np.asarray(pack_dir_words(bytes_out["dir"]))
    np.testing.assert_array_equal(np.asarray(packed_out["dir_words"]),
                                  want)
    for k in ("max_score", "max_i", "max_j", "pos_score"):
        np.testing.assert_array_equal(np.asarray(packed_out[k]),
                                      np.asarray(bytes_out[k]),
                                      err_msg=k)


@pytest.mark.parametrize("sc", [(2, -3, -4, -2), (5, -4, -8, -6),
                                (3, -1, -2, -1)])
def test_pallas_matches_jax_nondefault_scoring(sc):
    import numpy as np
    from darwin_tpu.ops.pallas_dp import align_tiles_pallas
    from darwin_tpu.ops.reference_dp import align_tiles_jax
    m, mm, go, ge = sc
    rng = np.random.default_rng(sum(abs(x) for x in sc))
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    B, T = 16, 64
    ref = alpha[rng.integers(0, 4, size=(B, T))]
    query = ref.copy()
    mut = rng.random((B, T)) < 0.15
    query[mut] = alpha[rng.integers(0, 4, size=int(mut.sum()))]
    rlen = rng.integers(T // 2, T + 1, size=B).astype(np.int32)
    qlen = rng.integers(T // 2, T + 1, size=B).astype(np.int32)
    kw = dict(match=m, mismatch=mm, gap_open=go, gap_extend=ge)
    want = align_tiles_jax(ref, query, rlen, qlen, **kw)
    got = align_tiles_pallas(ref, query, rlen, qlen, block_b=8,
                             interpret=True, **kw)
    np.testing.assert_array_equal(got["dir"][:, :, :T + 1],
                                  want["dir"][:, :, :T + 1])
    for k in ("max_score", "max_i", "max_j", "pos_score"):
        np.testing.assert_array_equal(got[k], want[k])


@pytest.mark.parametrize("B,T,block_b,interleave",
                         [(16, 24, 16, 2), (32, 24, 32, 4)])
def test_pallas_interpret_ilp_streams(B, T, block_b, interleave):
    """interleave>1 (independent per-stream refs) must be bit-identical
    to the plain kernel for every dir format."""
    import numpy as np
    from darwin_tpu.ops.pallas_dp import align_tiles_pallas
    from darwin_tpu.ops.reference_dp import align_tiles_jax
    from darwin_tpu.ops.traceback import pack_dir_words6

    rng = np.random.default_rng(100 + interleave)
    ref, query, rlen, qlen = make_batch(rng, B, T)
    kw = dict(match=MATCH, mismatch=MISMATCH, gap_open=GO,
              gap_extend=GE)
    want = align_tiles_jax(ref, query, rlen, qlen, **kw)
    got = align_tiles_pallas(ref, query, rlen, qlen, block_b=block_b,
                             interpret=True, dir_format="packed6",
                             interleave=interleave, **kw)
    for k in ("max_score", "max_i", "max_j", "pos_score"):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)
    wantw = np.asarray(pack_dir_words6(want["dir"]))
    np.testing.assert_array_equal(
        np.asarray(got["dir_words"])[:, :, : wantw.shape[2]], wantw)


def test_pallas_rejects_sub128_block_when_compiled():
    """block_b < B with block_b % 128 != 0 cannot lower on TPU
    hardware (Mosaic block-shape rule); align_tiles_pallas raises a
    geometry error up front instead of failing inside pallas_call.
    Interpret mode keeps accepting any block_b (the tests above use
    4/8)."""
    rng = np.random.default_rng(0)
    ref, query, rlen, qlen = make_batch(rng, 256, 24)
    with pytest.raises(ValueError, match="block_b"):
        align_tiles_pallas(ref, query, rlen, qlen, match=MATCH,
                           mismatch=MISMATCH, gap_open=GO,
                           gap_extend=GE, block_b=32,
                           interpret=False)
