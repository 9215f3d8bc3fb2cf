"""Shared constants for the GACT tile DP kernels.

Op encoding matches the reference (align.h:22): ZERO=0, DELETE=1,
INSERT=2, MATCH=3; direction bytes carry "gap-open won" flags
2<<INSERT_OP = 8 and 2<<DELETE_OP = 4 (align.cpp:170-171).
"""

ZERO_OP, DELETE_OP, INSERT_OP, MATCH_OP = 0, 1, 2, 3
GAP_OPEN_FLAG_I = 2 << INSERT_OP  # 8
GAP_OPEN_FLAG_D = 2 << DELETE_OP  # 4
# Extension over the reference's 4-bit dir layout: bit 4 records char
# equality at the cell, so rescoring after traceback needs no sequence
# gathers.  The reference's traceback semantics (op = byte % 4, flag
# tests & 8 / & 4) are unaffected.
MATCH_BIT = 16

# Large negative standing in for the reference's -(1<<30) (align.h:18);
# small enough that adding gap penalties cannot wrap int32.
NEG_INF = 1 << 30

# Tile padding bytes: sequences are raw ASCII (>= 33); 1 and 2 never
# match real characters or each other (the CUDA path pads with 4/5 for
# the same reason, cuda_host.cu:100-126).
PAD_REF = 1
PAD_QUERY = 2
