"""Code-database layer: ALIST parsing, GF(2) linear algebra, code construction."""

from ldpc_tpu.models.alist import read_alist, AlistMatrix
from ldpc_tpu.models.code import LDPCCode, EdgeLayout
from ldpc_tpu.models.catalog import MatrixCatalog, MatrixInfo

__all__ = [
    "read_alist",
    "AlistMatrix",
    "LDPCCode",
    "EdgeLayout",
    "MatrixCatalog",
    "MatrixInfo",
]
