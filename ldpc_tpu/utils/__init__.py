"""Shared utilities: timing, database discovery."""

from ldpc_tpu.utils.timing import Timer
from ldpc_tpu.utils.db import default_matrix_db

__all__ = ["Timer", "default_matrix_db"]
