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
