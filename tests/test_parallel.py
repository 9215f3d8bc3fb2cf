"""Multi-device sharding tests on the 8-virtual-CPU-device mesh."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from darwin_tpu.engine.aligner import JaxTileAligner
from darwin_tpu.parallel.mesh import (ShardedTileAligner, make_mesh,
                                      merge_overlap_records)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import __graft_entry__  # noqa: E402


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_sharded_aligner_matches_single(mesh8):
    """Batch sharded over 8 devices == single-device results."""
    T, ET = 32, 12
    ref, query, rlen, qlen, firsts = __graft_entry__._example_batch(
        48, T, seed=5)
    kw = dict(tile_size=T, early_terminate=ET, match=1, mismatch=-1,
              gap_open=-1, gap_extend=-1)
    single = JaxTileAligner(backend="lax", **kw)
    sharded = ShardedTileAligner(mesh8, backend="lax", **kw)
    a = single(ref, query, rlen, qlen, firsts)
    b = sharded(ref, query, rlen, qlen, firsts)
    np.testing.assert_array_equal(a.ops, b.ops)
    np.testing.assert_array_equal(a.score, b.score)
    np.testing.assert_array_equal(a.ref_steps, b.ref_steps)
    np.testing.assert_array_equal(a.max_i, b.max_i)


def test_merge_overlap_records(mesh8):
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 5, size=(16, 8)).astype(np.int32)
    rows[3, 0] = -1  # padding row
    merged = merge_overlap_records(mesh8, rows)
    valid = rows[rows[:, 0] >= 0]
    want = np.unique(valid, axis=0)
    np.testing.assert_array_equal(merged, want)


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    fn, args = __graft_entry__.entry()
    jax.jit(fn).lower(*args).compile()
