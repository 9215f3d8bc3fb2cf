from darwin_tpu.engine.aligner import JaxTileAligner
from darwin_tpu.engine.batch import GactCalls, run_gact_batch

__all__ = ["JaxTileAligner", "GactCalls", "run_gact_batch"]
