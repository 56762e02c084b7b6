from spada_tpu.io.mtx import load_mtx
from spada_tpu.io.workloads import (
    GemmWorkload,
    load_pickled_gemms,
    sort_by_length,
)

__all__ = [
    "load_mtx",
    "GemmWorkload",
    "load_pickled_gemms",
    "sort_by_length",
]
