from darwin_tpu.dsoft.filter import dsoft

__all__ = ["dsoft"]
