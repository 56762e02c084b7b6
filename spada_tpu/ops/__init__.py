from spada_tpu.ops.spgemm import spgemm, SpGemmResult

__all__ = ["spgemm", "SpGemmResult"]
