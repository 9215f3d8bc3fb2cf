"""Unit tests for 2-bit packing, hashing, and the minimizer scan.

The vectorized NumPy implementations are checked against direct Python
transliterations of the reference loops (ntcoding.cpp:74-182).
"""

import numpy as np
import pytest

from darwin_tpu.coding import (hash32, query_minimizers, ref_minimizers,
                               seeds_at_positions, seq_to_bytes,
                               seq_to_twobit_words)


def hash32_scalar(key: int, k: int) -> int:
    """Transliteration of ntcoding.cpp:74-85 (uint32 semantics)."""
    M32 = 0xFFFFFFFF
    m = (1 << (2 * k)) - 1
    key = ((~key & M32) + ((key << 21) & M32)) & M32 & m
    key = key ^ (key >> 24)
    key = (key + ((key << 3) & M32) + ((key << 8) & M32)) & M32 & m
    key = key ^ (key >> 14)
    key = (key + ((key << 2) & M32) + ((key << 4) & M32)) & M32 & m
    key = key ^ (key >> 28)
    key = (key + ((key << 31) & M32)) & M32 & m
    return key


def twobit_scalar(seq: str) -> list[int]:
    """Transliteration of SeqToTwoBit (ntcoding.cpp:87-103)."""
    lut = {"a": 0, "A": 0, "c": 1, "C": 1, "g": 2, "G": 2, "t": 3, "T": 3}
    n = len(seq)
    words = [0] * (1 + n // 16)
    for i, ch in enumerate(seq):
        words[i // 16] += lut.get(ch, 0) << (2 * (i % 16))
    return words


def minimizers_scalar(seq: str, k: int, w: int, s_len: int
                      ) -> list[tuple[int, int]]:
    """Transliteration of TwoBitToMinimizers (ntcoding.cpp:126-153).

    Returns [(p, m)] in scan order; s_len is the word-count convention.
    """
    words = twobit_scalar(seq)
    words += [0] * 8  # mimic heap zero-padding for tail reads

    def seed_at(p: int) -> int:
        idx, shift = divmod(p, 16)
        concat = (words[idx + 1] << 32) | words[idx]
        return (concat >> (2 * shift)) & ((1 << (2 * k)) - 1)

    window = [0] * w
    for p in range(w - 1):
        window[p] = hash32_scalar(seed_at(p), k)
    out = []
    last_m, last_p = 0, 0
    for p in range(w - 1, 16 * s_len - k - w):
        window[p % w] = hash32_scalar(seed_at(p), k)
        m = min(window)
        if m != last_m or p - last_p >= w:
            out.append((p, m))
            last_m, last_p = m, p
    return out


def random_seq(rng: np.random.Generator, n: int, alpha: str = "ACGT") -> str:
    return "".join(rng.choice(list(alpha)) for _ in range(n))


@pytest.mark.parametrize("k", [5, 12, 14, 15])
def test_hash32_matches_scalar(k):
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 32, size=256, dtype=np.uint64).astype(
        np.uint32)
    got = hash32(keys, k)
    want = [hash32_scalar(int(x), k) for x in keys]
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint32))


@pytest.mark.parametrize("n", [1, 15, 16, 17, 100, 1000])
def test_twobit_packing(n):
    rng = np.random.default_rng(n)
    seq = random_seq(rng, n, "ACGTNacgtn")
    got = seq_to_twobit_words(seq)
    want = np.array(twobit_scalar(seq), dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_seeds_at_positions():
    rng = np.random.default_rng(7)
    seq = random_seq(rng, 300)
    words = seq_to_twobit_words(seq)
    k = 14
    pos = np.arange(0, 280)
    got = seeds_at_positions(words, pos, k)
    lut = {"A": 0, "C": 1, "G": 2, "T": 3}
    for p in [0, 1, 15, 16, 17, 100, 279]:
        want = 0
        for i, ch in enumerate(seq[p:p + k]):
            want += lut[ch] << (2 * i)
        assert got[p] == want, p


@pytest.mark.parametrize("n", [50, 64, 100, 777, 4096])
@pytest.mark.parametrize("kw", [(14, 4), (12, 5)])
def test_ref_minimizers_match_scalar(n, kw):
    k, w = kw
    rng = np.random.default_rng(n * 31 + k)
    seq = random_seq(rng, n)
    s_len = 1 + n // 16  # reference-genome convention
    want = minimizers_scalar(seq, k, w, s_len)
    got = ref_minimizers(seq, k, w)
    got_pairs = [(int(x & 0xFFFFFFFF), int(x >> 32)) for x in got]
    assert got_pairs == want


@pytest.mark.parametrize("n", [50, 64, 100, 777, 4096])
def test_query_minimizers_match_scalar(n):
    k, w = 14, 4
    rng = np.random.default_rng(n * 13)
    seq = random_seq(rng, n)
    s_len = (n + 15) // 16  # query convention
    want = minimizers_scalar(seq, k, w, s_len)
    offs, hashes = query_minimizers(seq, k, w)
    got = list(zip(offs.tolist(), hashes.tolist()))
    assert got == want


def test_seq_to_bytes_roundtrip():
    s = "ACGTNacgtn"
    assert seq_to_bytes(s).tobytes().decode() == s
