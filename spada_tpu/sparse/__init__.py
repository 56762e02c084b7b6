from spada_tpu.sparse.csr import CsrMatrix
from spada_tpu.sparse.bsr import BsrMatrix, tiles_of_csr

__all__ = ["CsrMatrix", "BsrMatrix", "tiles_of_csr"]
