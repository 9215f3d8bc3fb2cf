"""Packed-word traceback must be bit-identical to the byte walk.

traceback_packed_jax advances two steps per gather from the packed
word matrix (pack_dir_words / the Pallas kernel's dir_format="packed");
every output (ops stream, match bits, step counts) must equal
traceback_jax's on the same tiles.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from darwin_tpu.ops.reference_dp import align_tiles_jax  # noqa: E402
from darwin_tpu.ops.traceback import (pack_dir_words,  # noqa: E402
                                      traceback_jax,
                                      traceback_packed_jax)

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def _random_tiles(rng, B, T, div, ragged=False):
    refs = ALPHA[rng.integers(0, 4, size=(B, T))]
    queries = refs.copy()
    mut = rng.random((B, T)) < div
    queries[mut] = ALPHA[rng.integers(0, 4, size=int(mut.sum()))]
    if ragged:
        rlen = rng.integers(1, T + 1, size=B).astype(np.int32)
        qlen = rng.integers(1, T + 1, size=B).astype(np.int32)
    else:
        rlen = np.full(B, T, np.int32)
        qlen = np.full(B, T, np.int32)
    return refs, queries, rlen, qlen


@pytest.mark.parametrize("T,div,ragged,et", [
    (40, 0.1, False, 24),
    (40, 0.5, True, 24),
    (64, 0.02, True, 40),
    (32, 0.9, False, 200),   # mostly-zero dir matrices, short walks
])
def test_packed_walk_matches_byte_walk(T, div, ragged, et):
    rng = np.random.default_rng(T * 1000 + int(div * 100))
    B = 32
    refs, queries, rlen, qlen = _random_tiles(rng, B, T, div, ragged)
    firsts = np.zeros(B, bool)
    firsts[::2] = True
    out = align_tiles_jax(refs, queries, rlen, qlen, match=1,
                          mismatch=-1, gap_open=-1, gap_extend=-1)
    a = traceback_jax(out["dir"], rlen, qlen, firsts, out["max_i"],
                      out["max_j"], early_terminate=et)
    words = pack_dir_words(out["dir"])
    b = traceback_packed_jax(words, rlen, qlen, firsts, out["max_i"],
                             out["max_j"], early_terminate=et)
    for x, y, name in zip(a, b, ("ops", "mbits", "i_steps", "j_steps")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)


def test_packed_walk_degenerate_starts():
    """first tiles with max at (0,0) (all-mismatch) and zero-length
    walks must stay silent, like the byte walk."""
    B, T = 8, 24
    refs = np.full((B, T), ord("A"), np.uint8)
    queries = np.full((B, T), ord("C"), np.uint8)
    rlen = np.full(B, T, np.int32)
    qlen = np.full(B, T, np.int32)
    firsts = np.ones(B, bool)
    out = align_tiles_jax(refs, queries, rlen, qlen, match=1,
                          mismatch=-1, gap_open=-1, gap_extend=-1)
    a = traceback_jax(out["dir"], rlen, qlen, firsts, out["max_i"],
                      out["max_j"], early_terminate=16)
    b = traceback_packed_jax(pack_dir_words(out["dir"]), rlen, qlen,
                             firsts, out["max_i"], out["max_j"],
                             early_terminate=16)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pack_dir_words_layout():
    d = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4) % 32
    w = np.asarray(pack_dir_words(jnp.asarray(d)))
    for b in range(2):
        for r in range(3):
            for c in range(4):
                want = int(d[b, r, c])
                want |= int(d[b, r, c + 1]) << 8 if c + 1 < 4 else 0
                want |= int(d[b, r - 1, c]) << 16 if r >= 1 else 0
                if r >= 1 and c + 1 < 4:
                    want |= int(d[b, r - 1, c + 1]) << 24
                assert w[b, r, c] == want, (b, r, c)
