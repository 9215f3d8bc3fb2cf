"""Span-fetch kernel vs plain slicing (interpret mode on CPU)."""

from __future__ import annotations

import numpy as np
import pytest

from darwin_tpu.ops.tile_fetch import (ROW, build_combined_bank,
                                       fetch_tiles)


@pytest.mark.parametrize("T", [64, 320])
def test_fetch_tiles_matches_slices(T):
    rng = np.random.default_rng(T)
    flat = rng.integers(65, 91, size=10_000).astype(np.uint8)
    bank, GP = build_combined_bank(flat, pad_byte=0)
    assert GP % ROW == 0 and bank.shape[1:] == (1, ROW)
    fwd = np.full(GP, 0, np.uint8)
    fwd[: len(flat)] = flat

    B = 64
    starts = rng.integers(0, GP - T, size=B).astype(np.int32)
    rev = rng.random(B) < 0.5  # mixed: forward spans + reversed reads

    # Forward spans address the first copy; reversed reads (tile read
    # back-to-front) address the reversed copy at 2*GP - start - T.
    eff = np.where(rev, starts, 2 * GP - starts - T).astype(np.int32)
    out = np.asarray(fetch_tiles(eff, bank, T=T, n_rows=bank.shape[0],
                                 interpret=True))
    for b in range(B):
        span = fwd[starts[b]: starts[b] + T]
        want = span if rev[b] else span[::-1]
        np.testing.assert_array_equal(out[b, :T], want, err_msg=str(b))


def test_fetch_tiles_clips_padding_slots():
    rng = np.random.default_rng(1)
    flat = rng.integers(65, 91, size=2048).astype(np.uint8)
    bank, GP = build_combined_bank(flat, pad_byte=0)
    eff = np.array([0, -50, 10 ** 9, 5] + [0] * 4, dtype=np.int32)
    out = fetch_tiles(eff, bank, T=64, n_rows=bank.shape[0],
                      interpret=True)
    assert out.shape[0] == 8  # no crash; garbage rows are masked by
    # callers via per-tile lengths
