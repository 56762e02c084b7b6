from spada_tpu.sparse.csr import CsrMatrix
from spada_tpu.sparse.bsr import BsrMatrix, BsrValueMap, tiles_of_csr

__all__ = ["CsrMatrix", "BsrMatrix", "BsrValueMap", "tiles_of_csr"]
