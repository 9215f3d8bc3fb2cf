"""Vectorized traceback over a batch of direction matrices.

Semantics of AlignWithBT's traceback loop (reference align.cpp:185-231):
walk from the start cell until a ZERO op or until either axis has
consumed early_terminate steps; INSERT moves up (ref axis), DELETE moves
left (query axis), and their "gap-open won" flag at the *current* cell
switches the next state to MATCH.

All batch items step in lockstep inside a while_loop that exits as soon
as every item is done (real walks rarely exceed ~ET steps).  One
batched gather per step suffices: the INSERT/DELETE flag test uses the
*current* cell (whose byte we carry from the previous step), and only
the MATCH transition needs the newly entered cell — which is exactly
the one gather fetches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from darwin_tpu.ops.common import (GAP_OPEN_FLAG_D, GAP_OPEN_FLAG_I,
                                   MATCH_BIT)


@functools.partial(jax.jit, static_argnames=("early_terminate",))
def traceback_jax(dirm: jnp.ndarray, ref_len: jnp.ndarray,
                  query_len: jnp.ndarray, first: jnp.ndarray,
                  max_i: jnp.ndarray, max_j: jnp.ndarray,
                  *, early_terminate: int):
    """Args:
      dirm: [B, T, C] uint8 direction matrices; row r holds DP row r+1
        (DP row 0 and column 0 read as ZERO).
      ref_len, query_len: [B] tile lengths = anchor cell for non-first
        tiles (GACT always anchors at the corner, gact.cpp:93, 155).
      first: [B] bool; first tiles start at (max_i, max_j).

    Returns:
      ops: [S, B] uint8 op stream in walk order (0 = none), S = 2*ET-1.
      mbits: [S, B] bool — for MATCH ops, whether the cell's chars were
        equal (the dir byte's MATCH_BIT), so rescoring needs no
        sequence gathers; False for non-MATCH ops.
      i_steps, j_steps: [B] int32 ref/query steps consumed.
    """
    B, T, C = dirm.shape
    ET = early_terminate
    S = 2 * ET - 1
    dt = jnp.int32
    # Keep the dir matrix uint8 and widen only the gathered column:
    # widening [B, T*C] up front would materialize ~4x the matrix's
    # footprint in HBM every step (measured ~5 ms/step at B=2048,T=320).
    flat = dirm.reshape(B, T * C)

    def cell(i, j):
        # DP coordinates; row 0 / col 0 are implicit ZERO.  Clip
        # defensively: inactive walkers can sit at i == -1 after a
        # boundary MATCH, exactly like the reference's i_curr (which it
        # never reads again either).
        idx = jnp.clip(i - 1, 0, T - 1) * C + jnp.clip(j, 0, C - 1)
        v = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
        return jnp.where((i >= 1) & (j >= 1), v.astype(dt), 0)

    i0 = jnp.where(first, max_i, ref_len).astype(dt)
    j0 = jnp.where(first, max_j, query_len).astype(dt)
    val0 = cell(i0, j0)

    ops0 = jnp.zeros((S, B), jnp.uint8)
    zero = jnp.zeros((B,), dt)

    def cond(carry):
        s, ops, val, state, i, j, i_steps, j_steps = carry
        active = (state != 0) & (i_steps < ET) & (j_steps < ET)
        return (s < S) & jnp.any(active)

    def step(carry):
        s, ops, val, state, i, j, i_steps, j_steps = carry
        active = (state != 0) & (i_steps < ET) & (j_steps < ET)
        # One scatter carries both the op and, for MATCH ops, the
        # current cell's MATCH_BIT; they are split after the loop.
        rec = state + jnp.where(state == 3, val & MATCH_BIT, 0)
        ops = ops.at[s].set(jnp.where(active, rec, 0).astype(jnp.uint8))

        is_m = state == 3
        is_i = state == 2
        di = jnp.where(is_m | is_i, 1, 0)
        dj = jnp.where(is_m, 1, jnp.where(is_i, 0, 1))
        ni = jnp.where(active, i - di, i)
        nj = jnp.where(active, j - dj, j)

        # The cell just entered — needed for the MATCH transition now
        # and carried as "current cell" for the next step's flag tests.
        nval = cell(ni, nj)
        next_state = jnp.where(
            is_m, nval % 4,
            jnp.where(
                is_i,
                jnp.where((val & GAP_OPEN_FLAG_I) != 0, 3, 2),
                jnp.where((val & GAP_OPEN_FLAG_D) != 0, 3, 1)))

        state = jnp.where(active, next_state, state)
        val = jnp.where(active, nval, val)
        i_steps = i_steps + jnp.where(active, di, 0)
        j_steps = j_steps + jnp.where(active, dj, 0)
        return (s + 1, ops, val, state, ni, nj, i_steps, j_steps)

    state0 = val0 % 4
    carry = (jnp.int32(0), ops0, val0, state0, i0, j0, zero, zero)
    _, raw, _, _, _, _, i_steps, j_steps = jax.lax.while_loop(
        cond, step, carry)
    return raw & 3, raw >= MATCH_BIT, i_steps, j_steps


def pack_dir_words(dirm: jnp.ndarray) -> jnp.ndarray:
    """[B, T, C] uint8 dir matrix -> [B, T, C] int32 traceback words.

    words[b, r, c] = D(r,c) | D(r,c+1)<<8 | D(r-1,c)<<16 | D(r-1,c+1)<<24
    (missing neighbours read 0).  The Pallas kernel emits this layout
    directly (dir_format="packed"); this helper produces it from the
    byte matrix for the lax path and for differential tests.
    """
    d = dirm.astype(jnp.int32)
    right = jnp.pad(d[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
    t = d + (right << 8)
    t_up = jnp.pad(t[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
    return t + (t_up << 16)


@functools.partial(jax.jit, static_argnames=("early_terminate", "unroll"))
def traceback_packed_jax(words: jnp.ndarray, ref_len: jnp.ndarray,
                         query_len: jnp.ndarray, first: jnp.ndarray,
                         max_i: jnp.ndarray, max_j: jnp.ndarray,
                         *, early_terminate: int, unroll: int = 1):
    """Bit-identical to traceback_jax, two walk steps per iteration.

    One int32 gather at (i-1, j-1) of the packed word matrix (see
    pack_dir_words) yields the walker's current cell AND all three move
    targets, so each while_loop iteration — whose cost is dominated by
    a fixed ~20us loop overhead plus one [B] gather — advances two
    steps instead of one.  Returns the same (ops, mbits, i_steps,
    j_steps) as traceback_jax.

    unroll=U runs U gather+advance pairs per while_loop trip (2U walk
    steps), amortizing the fixed per-trip overhead; the op layout is
    unchanged (uniform advance), so outputs stay bit-identical for any
    U.  The early-exit check runs every U pairs — finished lanes just
    record zeros, exactly as in the U=1 loop.
    """
    B, T, C = words.shape
    ET = early_terminate
    S = 2 * ET - 1
    # Slot count rounded to the per-trip record width (2 per pair).
    SP = -(-(S + 1) // (2 * unroll)) * (2 * unroll)
    dt = jnp.int32
    flat = words.reshape(B, T * C)

    def gather_word(i, j):
        idx = (jnp.clip(i - 1, 0, T - 1) * C
               + jnp.clip(j - 1, 0, C - 1))
        w = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
        return jnp.where((i >= 1) & (j >= 1), w, 0)

    def resolve(pstate, pval, cur_op):
        # State on entering a cell, from the state/byte of the cell we
        # left: a MATCH consumes the entered cell's op bits; I/D turn
        # into MATCH when the left cell carries the gap-open-won flag
        # (align.cpp:205-226 semantics, as in traceback_jax).
        return jnp.where(
            pstate == 3, cur_op & 3,
            jnp.where(
                pstate == 2,
                jnp.where((pval & GAP_OPEN_FLAG_I) != 0, 3, 2),
                jnp.where(
                    pstate == 1,
                    jnp.where((pval & GAP_OPEN_FLAG_D) != 0, 3, 1),
                    0)))

    i0 = jnp.where(first, max_i, ref_len).astype(dt)
    j0 = jnp.where(first, max_j, query_len).astype(dt)
    ops0 = jnp.zeros((SP, B), jnp.uint8)
    zero = jnp.zeros((B,), dt)

    def cond(carry):
        s, ops, pstate, pval, i, j, i_steps, j_steps = carry
        pending = (pstate != 0) & (i_steps < ET) & (j_steps < ET)
        return (s + 1 < SP) & jnp.any(pending)

    def gather_pair(pstate, pval, i, j, i_steps, j_steps):
        """One gather, two walk steps; returns the two op records and
        the advanced walker state."""
        w = gather_word(i, j)
        val = (w >> 8) & 0xFF          # current cell (i, j)
        state = resolve(pstate, pval, val)

        # Sub-step A: the op taken at (i, j).
        act_a = (state != 0) & (i_steps < ET) & (j_steps < ET)
        rec_a = jnp.where(
            act_a, state + jnp.where(state == 3, val & MATCH_BIT, 0), 0)
        is_m = state == 3
        is_i = state == 2
        di = jnp.where(is_m | is_i, 1, 0)
        dj = jnp.where(is_m, 1, jnp.where(is_i, 0, 1))
        i1 = jnp.where(act_a, i - di, i)
        j1 = jnp.where(act_a, j - dj, j)
        i_steps1 = i_steps + jnp.where(act_a, di, 0)
        j_steps1 = j_steps + jnp.where(act_a, dj, 0)
        # The entered cell's byte, from the same word.
        v_moved = jnp.where(is_m, (w >> 16) & 0xFF,
                            jnp.where(is_i, (w >> 24) & 0xFF, w & 0xFF))
        v_moved = jnp.where((i1 >= 1) & (j1 >= 1), v_moved, 0)
        val1 = jnp.where(act_a, v_moved, val)
        state1 = jnp.where(act_a, resolve(state, val, v_moved), state)

        # Sub-step B: the op taken at (i1, j1).
        act_b = (state1 != 0) & (i_steps1 < ET) & (j_steps1 < ET)
        rec_b = jnp.where(
            act_b,
            state1 + jnp.where(state1 == 3, val1 & MATCH_BIT, 0), 0)
        is_m1 = state1 == 3
        is_i1 = state1 == 2
        di1 = jnp.where(is_m1 | is_i1, 1, 0)
        dj1 = jnp.where(is_m1, 1, jnp.where(is_i1, 0, 1))
        i2 = jnp.where(act_b, i1 - di1, i1)
        j2 = jnp.where(act_b, j1 - dj1, j1)
        i_steps2 = i_steps1 + jnp.where(act_b, di1, 0)
        j_steps2 = j_steps1 + jnp.where(act_b, dj1, 0)
        # The next pair resolves the state at (i2, j2) from the
        # state/byte at (i1, j1); act_b=False lanes carry state1 whose
        # re-resolution is never observed (their act_a stays False).
        return (rec_a, rec_b), (state1, val1, i2, j2, i_steps2,
                                j_steps2)

    def step(carry):
        s, ops, pstate, pval, i, j, i_steps, j_steps = carry
        recs = []
        walker = (pstate, pval, i, j, i_steps, j_steps)
        for _ in range(unroll):
            (rec_a, rec_b), walker = gather_pair(*walker)
            recs += [rec_a, rec_b]
        group = jnp.stack(recs).astype(jnp.uint8)
        ops = jax.lax.dynamic_update_slice(ops, group, (s, zero[0]))
        return (s + 2 * unroll, ops) + walker

    # pstate=MATCH, pval=0 makes the first resolve() yield the start
    # cell's own op bits, exactly traceback_jax's state0 = val0 % 4.
    carry = (jnp.int32(0), ops0, jnp.full((B,), 3, dt), zero,
             i0, j0, zero, zero)
    _, raw, _, _, _, _, i_steps, j_steps = jax.lax.while_loop(
        cond, step, carry)
    raw = raw[:S]
    return raw & 3, raw >= MATCH_BIT, i_steps, j_steps
