"""Matrix-database discovery.

The framework consumes ALIST files from any directory. For convenience the
standard locations are probed in order: $LDPC_TPU_MATRIX_DB, a
Channel_Codes_Database directory next to the current working directory, and
the reference database if mounted.
"""

from __future__ import annotations

import os

_CANDIDATES = [
    os.environ.get("LDPC_TPU_MATRIX_DB", ""),
    "Channel_Codes_Database",
    "../Channel_Codes_Database",
    "/root/reference/Channel_Codes_Database",
]


def default_matrix_db() -> str | None:
    for cand in _CANDIDATES:
        if cand and os.path.isdir(cand):
            return cand
    return None


def find_matrix(name: str, db: str | None = None) -> str | None:
    """Locate a matrix file by basename anywhere under the database."""
    if os.path.isfile(name):
        return name
    db = db or default_matrix_db()
    if db is None:
        return None
    for root, _dirs, files in os.walk(db):
        if name in files:
            return os.path.join(root, name)
    return None
