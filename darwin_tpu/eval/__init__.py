from darwin_tpu.eval.datagen import sample_reads, synth_genome
from darwin_tpu.eval.sensitivity import measure_sensitivity

__all__ = ["synth_genome", "sample_reads", "measure_sensitivity"]
