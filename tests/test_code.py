"""Code construction: standard form, generator validity, edge layout, RU."""

import numpy as np
import pytest

from ldpc_tpu.models.alist import AlistMatrix
from ldpc_tpu.models.code import LDPCCode, build_edge_layout
from ldpc_tpu.models.generate import gallager_regular, hamming_7_4


def test_h_std_form(small_code):
    h_std = small_code.h_std_dense()
    k, m = small_code.k, small_code.m
    assert np.array_equal(h_std[:, k:], np.eye(m, dtype=np.uint8))
    assert np.array_equal(h_std[:, :k], small_code.A)


def test_generator_orthogonality(small_code):
    G = np.concatenate(
        [np.eye(small_code.k, dtype=np.uint8), small_code.A.T], axis=1
    )
    prod = (G.astype(np.int64) @ small_code.h_std_dense().T) & 1
    assert not prod.any()


def test_permutation_consistency(small_code):
    # H_std columns are the original H columns re-ordered by `permutation`
    H = small_code.H.to_dense()
    # std form is obtained from ROW-reduced H, so compare codeword membership:
    # random std-domain codewords must be orig-domain codewords after unpermute
    spec = small_code.standard_encode_spec
    u = np.random.default_rng(0).integers(0, 2, (16, small_code.k), dtype=np.uint8)
    w_std = spec.encode_numpy(u, "std")
    v = np.zeros_like(w_std)
    v[:, small_code.permutation] = w_std
    assert not ((H.astype(np.int64) @ v.T) & 1).any()


def test_rank_deficient_handling():
    # duplicate a row: rank < m, parameters must be adjusted like the reference.
    # (Gallager tier construction is itself rank-deficient: each tier's rows
    # sum to all-ones, so rank <= m - dv + 1.)
    from ldpc_tpu.models import gf2

    base = gallager_regular(24, 3, 6, seed=2)
    dense = base.to_dense()
    true_rank = gf2.rank(gf2.pack_rows(dense), 24)
    assert true_rank < 12
    dense_dup = np.vstack([dense, dense[0:1]])
    rows, cols = np.nonzero(dense_dup)
    alist = AlistMatrix(
        n=24, m=13, row_idx=rows.astype(np.int32), col_idx=cols.astype(np.int32)
    )
    code = LDPCCode(alist=alist, name="dup")
    assert code.rank_deficient
    assert code.m == true_rank and code.k == 24 - true_rank
    assert code.layout_orig.m == 13  # original graph keeps redundant checks
    spec = code.standard_encode_spec
    u = np.random.default_rng(1).integers(0, 2, (8, code.k), dtype=np.uint8)
    for graph, syn in (("std", code.syndrome_std), ("orig", code.syndrome_orig)):
        w = spec.encode_numpy(u, graph)
        assert not syn(w.T).any()


def test_edge_layout_reconstruction(small_code):
    for layout, dense in (
        (small_code.layout_orig, small_code.H.to_dense()),
        (small_code.layout_std, small_code.h_std_dense()),
    ):
        recon = np.zeros((layout.m, layout.n), dtype=np.uint8)
        for c in range(layout.m):
            for v in layout.chk_var[c]:
                if v < layout.n:
                    recon[c, v] ^= 1
        assert np.array_equal(recon, dense)

        # var_edge must be the exact inverse indexing of chk_var
        flat = layout.chk_var.reshape(-1)
        for v in range(layout.n):
            edges = [e for e in layout.var_edge[v] if e < layout.m * layout.dc]
            assert len(edges) == layout.var_deg[v]
            for e in edges:
                assert flat[e] == v


def test_layout_degrees(small_code):
    lo = small_code.layout_orig
    assert lo.dc == 6 and lo.dv == 3 and lo.n_edges == 144
    assert (lo.chk_deg == 6).all() and (lo.var_deg == 3).all()


def test_encode_specs_both_domains(small_code, wimax_matrix_path):
    codes = [small_code, LDPCCode(wimax_matrix_path)]
    rng = np.random.default_rng(0)
    for code in codes:
        u = rng.integers(0, 2, (8, code.k), dtype=np.uint8)
        for spec in (code.standard_encode_spec, code.richardson_urbanke_spec()):
            for graph, syn in (("std", code.syndrome_std), ("orig", code.syndrome_orig)):
                w = spec.encode_numpy(u, graph)
                assert not syn(w.T).any(), (code.name, spec.method, graph)
                assert np.array_equal(w[:, spec.info_pos(graph)], u)


def test_ru_and_standard_same_code(small_code):
    """Both encoders must generate the same codebook (same null space)."""
    std = small_code.standard_encode_spec
    ru = small_code.richardson_urbanke_spec()
    # every RU codeword satisfies H_std; every standard codeword satisfies H
    u = np.random.default_rng(2).integers(0, 2, (32, small_code.k), dtype=np.uint8)
    assert not small_code.syndrome_std(ru.encode_numpy(u, "std").T).any()
    assert not small_code.syndrome_orig(std.encode_numpy(u, "orig").T).any()


def test_ru_gap_request(small_code):
    auto = small_code.richardson_urbanke_spec()
    bigger = small_code.richardson_urbanke_spec(gap=auto.gap + 2)
    assert bigger.gap == auto.gap + 2
    u = np.random.default_rng(3).integers(0, 2, (8, small_code.k), dtype=np.uint8)
    w = bigger.encode_numpy(u, "orig")
    assert not small_code.syndrome_orig(w.T).any()
    assert np.array_equal(w[:, bigger.info_pos("orig")], u)


def test_hamming_code():
    code = LDPCCode(alist=hamming_7_4(), name="hamming74")
    assert (code.n, code.m, code.k) == (7, 3, 4)
    assert code.rate == pytest.approx(4 / 7)


def test_wimax_params(wimax_matrix_path):
    code = LDPCCode(wimax_matrix_path)
    assert (code.n, code.m, code.k) == (576, 288, 288)
    assert code.layout_orig.dc == 7 and code.layout_orig.dv == 6


def test_empty_matrix_raises():
    with pytest.raises(Exception):
        LDPCCode(alist=AlistMatrix(0, 0, np.zeros(0, np.int32), np.zeros(0, np.int32)))
