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


def bucket_steps(n: int, lo: int = 64) -> int:
    """Smallest value >= n from {lo*2^k, lo*3*2^(k-1)}.

    Half-octave buckets: twice the compile variants of bucket_pow2 but
    at most 33% padding waste instead of 50% — used for the engine's
    slot count, where idle slots cost real per-iteration work.
    """
    b = lo
    while b < n:
        if b * 3 // 2 >= n:
            return b * 3 // 2
        b *= 2
    return b
