from darwin_tpu.index.genome import Genome
from darwin_tpu.index.seed_table import SeedTable

__all__ = ["Genome", "SeedTable"]
