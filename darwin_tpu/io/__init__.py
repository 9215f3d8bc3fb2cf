from darwin_tpu.io.fasta import FastaRecord, parse_fasta, write_fasta

__all__ = ["FastaRecord", "parse_fasta", "write_fasta"]
