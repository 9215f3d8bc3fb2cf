"""Pallas tile-span fetch: aligned block DMA + in-VMEM roll extraction.

The GACT engine slices, every iteration, one [B, T] tile per slot out
of flat sequence banks.  XLA's TPU gather costs ~11 ns per ELEMENT
regardless of contiguity (measured: a [1024, 320] uint8 tile gather is
3.8 ms), which made the two per-iteration tile gathers the engine's
largest non-DP cost.  This kernel exploits that every tile is a
CONTIGUOUS span:

* the bank is viewed as [rows, 1, ROW] with ROW = 512; any span of
  length <= 2*ROW - (ROW-1) lives in two consecutive rows;
* per tile, the two rows arrive as scalar-prefetch-indexed blocks
  (Mosaic DMAs them, pipelined across the grid), and the span is
  extracted with one dynamic-shift lane roll (32-bit widened — Mosaic
  requires it) plus a static slice;
* REVERSED tiles (the engine reads forward-extension tiles
  back-to-front, align.cpp:130) become forward spans of a reversed
  copy of the bank appended below the original — same kernel, just a
  different row index.

Measured: 0.97 ms per [1024, 320] fetch batch vs 3.77 ms XLA gather.

The public helper returns (combined_bank3d, GP) at construction and a
jitted fetch(row, off) -> [B, TP] uint8; masking beyond the per-tile
length stays with the caller (1 vector op).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from darwin_tpu.utils import round_up as _round_up

ROW = 512
TILES_PER_STEP = 8


def build_combined_bank(flat: np.ndarray, pad_byte: int
                        ) -> tuple[np.ndarray, int]:
    """[rows, 1, ROW] uint8 bank: padded flat copy, then its reverse,
    then one margin row.  Returns (bank3d, GP) where GP is the padded
    forward length (the reverse copy starts at GP)."""
    GP = _round_up(max(1, len(flat)), ROW)
    fwd = np.full(GP, pad_byte, dtype=np.uint8)
    fwd[: len(flat)] = flat
    rev = fwd[::-1]
    margin = np.full(ROW, pad_byte, dtype=np.uint8)
    combined = np.concatenate([fwd, rev, margin])
    return combined.reshape(-1, 1, ROW), GP


def build_combined_bank_device(flat: np.ndarray, pad_byte: int):
    """Host-assembled combined bank uploaded in one device_put.

    Assembling on device (upload forward half only, reverse + concat
    on device) measured 42 s for a 50 MB bank even warm — XLA lowers
    the big 1-D uint8 reverse catastrophically — while device_put
    streams at ~25 MB/s over the same link, so uploading both copies
    host-assembled wins by an order of magnitude."""
    bank, GP = build_combined_bank(flat, pad_byte)
    return jax.device_put(bank), GP


def span_starts(starts, lengths, reverse, GP: int):
    """Combined-bank span starts for the engine's tile reads.

    reverse (pre-swap "reverse extension") tiles read [pos-len, pos)
    forward: span = starts.  Forward tiles read [pos, pos+len)
    back-to-front: out[k] = bank[pos + len - 1 - k] = rev_copy at
    GP - pos - len, offset by the copy's base GP.
    """
    fwd_read = starts  # caller passes pos-len for reverse tiles
    rev_read = 2 * GP - starts - lengths
    return jnp.where(reverse, fwd_read, rev_read)


@functools.partial(jax.jit, static_argnames=("T", "n_rows", "interpret"))
def fetch_tiles(eff_row, eff_off, bank3d, *, T: int, n_rows: int,
                interpret: bool = False):
    """eff_row/eff_off: [B] int32 span starts as (bank row, byte within
    row) — split addressing so banks beyond 2^31 bytes stay int32-safe
    on device (rows cap at bytes/512).  Returns [B, TP] uint8 where
    TP = T rounded up to 128 lanes (tail lanes are bank bytes, callers
    mask).  B must be a multiple of 8."""
    B = eff_row.shape[0]
    TP = _round_up(T, 128)
    assert TP + ROW - 1 <= 2 * ROW, (T, ROW)
    assert B % TILES_PER_STEP == 0, B
    C = TILES_PER_STEP
    grid = (B // C,)

    def kernel(row_ref, off_ref, *refs):
        del row_ref
        blocks = refs[: 2 * C]
        out_ref = refs[2 * C]
        b = pl.program_id(0)
        for t in range(C):
            span = jnp.concatenate(
                [blocks[2 * t][0], blocks[2 * t + 1][0]],
                axis=1).astype(jnp.int32)  # dynamic roll is 32-bit only
            off = off_ref[b * C + t]
            rolled = pltpu.roll(span, -off, 1)
            out_ref[t: t + 1, :] = rolled[:, :TP].astype(jnp.uint8)

    def mk_spec(t, second):
        def imap(b, row, off):
            return (row[b * C + t] + second, 0, 0)
        return pl.BlockSpec((1, 1, ROW), imap, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[mk_spec(t, s) for t in range(C) for s in (0, 1)],
        out_specs=pl.BlockSpec((C, TP), lambda b, row, off: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    # Clip defensively: padding slots may carry arbitrary starts.  The
    # highest legal row still reads rows (n_rows-2, n_rows-1).
    row = jnp.clip(eff_row.astype(jnp.int32), 0, n_rows - 2)
    off = jnp.clip(eff_off.astype(jnp.int32), 0, ROW - 1)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, TP), jnp.uint8),
        interpret=interpret,
    )(row, off, *([bank3d] * (2 * C)))
