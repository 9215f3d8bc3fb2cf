"""Vectorized traceback over a batch of direction matrices.

Semantics of AlignWithBT's traceback loop (reference align.cpp:185-231):
walk from the start cell until a ZERO op or until either axis has
consumed early_terminate steps; INSERT moves up (ref axis), DELETE moves
left (query axis), and their "gap-open won" flag at the *current* cell
switches the next state to MATCH.

All batch items step in lockstep (every real walk is <= 2*ET-1 steps);
finished items emit op 0.  The two data-dependent reads per step
(current cell for gap flags, diagonal cell for MATCH) are batched
gathers on the flattened matrices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from darwin_tpu.ops.common import GAP_OPEN_FLAG_D, GAP_OPEN_FLAG_I


@functools.partial(jax.jit, static_argnames=("early_terminate",))
def traceback_jax(dirm: jnp.ndarray, ref_len: jnp.ndarray,
                  query_len: jnp.ndarray, first: jnp.ndarray,
                  max_i: jnp.ndarray, max_j: jnp.ndarray,
                  *, early_terminate: int):
    """Args:
      dirm: [B, R, C] uint8 direction matrices (row/col 0 ZERO).
      ref_len, query_len: [B] tile lengths = anchor cell for non-first
        tiles (GACT always anchors at the corner, gact.cpp:93, 155).
      first: [B] bool; first tiles start at (max_i, max_j).

    Returns:
      ops: [S, B] uint8 op stream in walk order (0 = none), S = 2*ET-1.
      i_steps, j_steps: [B] int32 ref/query steps consumed.
    """
    B, R, C = dirm.shape
    ET = early_terminate
    S = 2 * ET - 1
    dt = jnp.int32
    flat = dirm.reshape(B, R * C).astype(dt)

    def cell(i, j):
        # Clip defensively: inactive walkers can sit at i == -1 after a
        # boundary MATCH, exactly like the reference's i_curr (which it
        # never reads again either).
        idx = jnp.clip(i, 0, R - 1) * C + jnp.clip(j, 0, C - 1)
        return jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]

    i0 = jnp.where(first, max_i, ref_len).astype(dt)
    j0 = jnp.where(first, max_j, query_len).astype(dt)
    state0 = cell(i0, j0) % 4

    ops0 = jnp.zeros((S, B), jnp.uint8)
    zero = jnp.zeros((B,), dt)

    def step(s, carry):
        ops, state, i, j, i_steps, j_steps = carry
        active = (state != 0) & (i_steps < ET) & (j_steps < ET)
        ops = ops.at[s].set(
            jnp.where(active, state, 0).astype(jnp.uint8))

        cur = cell(i, j)
        diag = cell(jnp.maximum(i - 1, 0), jnp.maximum(j - 1, 0))

        is_m = state == 3
        is_i = state == 2
        is_d = state == 1
        next_state = jnp.where(
            is_m, diag % 4,
            jnp.where(
                is_i,
                jnp.where((cur & GAP_OPEN_FLAG_I) != 0, 3, 2),
                jnp.where((cur & GAP_OPEN_FLAG_D) != 0, 3, 1)))

        di = jnp.where(is_m | is_i, 1, 0)
        dj = jnp.where(is_m | is_d, 1, 0)
        state = jnp.where(active, next_state, state)
        i = jnp.where(active, i - di, i)
        j = jnp.where(active, j - dj, j)
        i_steps = jnp.where(active, i_steps + di, i_steps)
        j_steps = jnp.where(active, j_steps + dj, j_steps)
        return ops, state, i, j, i_steps, j_steps

    ops, _, _, _, i_steps, j_steps = jax.lax.fori_loop(
        0, S, step, (ops0, state0, i0, j0, zero, zero))
    return ops, i_steps, j_steps
