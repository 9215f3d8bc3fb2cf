"""Small shared helpers (shape bucketing / alignment)."""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Smallest multiple of m that is >= x."""
    return (x + m - 1) // m * m


def bucket_pow2(n: int, lo: int = 64) -> int:
    """Smallest power-of-two >= n, starting at lo.

    Used to bucket dynamic sizes (call counts, bank lengths, read
    batches) so jitted programs are reusable across similar workloads.
    """
    b = lo
    while b < n:
        b *= 2
    return b
