from darwin_tpu.coding.ntcoding import (
    hash32,
    minimizer_scan,
    query_minimizers,
    ref_minimizers,
    seeds_at_positions,
    seq_to_bytes,
    seq_to_twobit_words,
)

__all__ = [
    "hash32",
    "minimizer_scan",
    "query_minimizers",
    "ref_minimizers",
    "seeds_at_positions",
    "seq_to_bytes",
    "seq_to_twobit_words",
]
