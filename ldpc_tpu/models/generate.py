"""Synthetic LDPC code construction + ALIST writing.

The reference ships a static database of 119 ALIST files; this module lets
the framework operate standalone: Gallager-style regular LDPC ensembles for
arbitrary (n, dv, dc), the classic Hamming(7,4) code (same parameters as the
reference's BCH_7_4_1 matrix), and an ALIST writer so generated codes can be
stored in the interchange format the parser reads.
"""

from __future__ import annotations

import numpy as np

from ldpc_tpu.models.alist import AlistMatrix


def hamming_7_4() -> AlistMatrix:
    """Hamming (7,4): the textbook 3x7 parity-check matrix."""
    H = np.array(
        [
            [1, 0, 1, 0, 1, 0, 1],
            [0, 1, 1, 0, 0, 1, 1],
            [0, 0, 0, 1, 1, 1, 1],
        ],
        dtype=np.uint8,
    )
    rows, cols = np.nonzero(H)
    return AlistMatrix(n=7, m=3, row_idx=rows.astype(np.int32), col_idx=cols.astype(np.int32))


def gallager_regular(
    n: int, dv: int = 3, dc: int = 6, seed: int = 0, max_tries: int = 50
) -> AlistMatrix:
    """(dv, dc)-regular Gallager ensemble: dv stacked permutation tiers.

    Each tier partitions a random column permutation into groups of dc, one
    group per check. Tiers are resampled if they would duplicate an edge, so
    the result is exactly (dv, dc)-regular.
    """
    if (n * dv) % dc != 0:
        raise ValueError(f"n*dv must be divisible by dc (n={n}, dv={dv}, dc={dc})")
    m = n * dv // dc
    tier_rows = m // dv
    if tier_rows * dv != m:
        raise ValueError("dv must divide m = n*dv/dc")

    rng = np.random.default_rng(seed)
    edges: set[tuple[int, int]] = set()
    rows: list[int] = []
    cols: list[int] = []

    for tier in range(dv):
        for attempt in range(max_tries):
            perm = rng.permutation(n)
            tier_edges = [
                (tier * tier_rows + i, int(perm[i * dc + j]))
                for i in range(tier_rows)
                for j in range(dc)
            ]
            if all(e not in edges for e in tier_edges):
                edges.update(tier_edges)
                rows.extend(r for r, _ in tier_edges)
                cols.extend(c for _, c in tier_edges)
                break
        else:
            raise RuntimeError(
                f"Could not sample a duplicate-free tier {tier} in {max_tries} tries"
            )

    order = np.lexsort((cols, rows))
    return AlistMatrix(
        n=n,
        m=m,
        row_idx=np.asarray(rows, dtype=np.int32)[order],
        col_idx=np.asarray(cols, dtype=np.int32)[order],
    )


def write_alist(matrix: AlistMatrix, path: str) -> None:
    """Serialize in the dialect the parser reads (N M header, 1-based,
    zero-padded fixed-width index rows)."""
    col_deg = matrix.col_degrees()
    row_deg = matrix.row_degrees()
    dv, dc = int(col_deg.max(initial=0)), int(row_deg.max(initial=0))

    col_lists: list[list[int]] = [[] for _ in range(matrix.n)]
    row_lists: list[list[int]] = [[] for _ in range(matrix.m)]
    for r, c in zip(matrix.row_idx, matrix.col_idx):
        col_lists[c].append(int(r) + 1)
        row_lists[r].append(int(c) + 1)

    def fixed(entries: list[int], width: int) -> str:
        return " ".join(str(e) for e in entries + [0] * (width - len(entries)))

    with open(path, "w") as fh:
        fh.write(f"{matrix.n} {matrix.m}\n")
        fh.write(f"{dv} {dc}\n")
        fh.write(" ".join(str(int(d)) for d in col_deg) + "\n")
        fh.write(" ".join(str(int(d)) for d in row_deg) + "\n")
        for entries in col_lists:
            fh.write(fixed(entries, dv) + "\n")
        for entries in row_lists:
            fh.write(fixed(entries, dc) + "\n")
