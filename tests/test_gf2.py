"""Bit-packed GF(2) linear algebra tests."""

import numpy as np
import pytest

from ldpc_tpu.models import gf2


@pytest.mark.parametrize("shape", [(3, 7), (8, 64), (5, 65), (16, 200)])
def test_pack_unpack_roundtrip(shape):
    rng = np.random.default_rng(0)
    dense = rng.integers(0, 2, shape, dtype=np.uint8)
    packed = gf2.pack_rows(dense)
    assert np.array_equal(gf2.unpack_rows(packed, shape[1]), dense)


def test_get_set_bit():
    dense = np.zeros((2, 70), dtype=np.uint8)
    packed = gf2.pack_rows(dense)
    gf2.set_bit(packed, 1, 69, 1)
    assert gf2.get_bit(packed, 1, 69) == 1
    assert gf2.unpack_rows(packed, 70)[1, 69] == 1
    gf2.set_bit(packed, 1, 69, 0)
    assert gf2.get_bit(packed, 1, 69) == 0


def _rref_dense_bruteforce(dense):
    """Straightforward O(m^2 n) RREF for cross-checking."""
    M = dense.astype(np.int64).copy()
    m, n = M.shape
    pivots = []
    r = 0
    for c in range(n):
        if r >= m:
            break
        rows = np.nonzero(M[r:, c])[0]
        if rows.size == 0:
            continue
        p = r + rows[0]
        M[[r, p]] = M[[p, r]]
        for other in range(m):
            if other != r and M[other, c]:
                M[other] ^= M[r]
        pivots.append(c)
        r += 1
    return M.astype(np.uint8), pivots


@pytest.mark.parametrize("seed", range(5))
def test_rref_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    m, n = rng.integers(3, 12), rng.integers(5, 90)
    dense = (rng.random((m, n)) < 0.3).astype(np.uint8)
    reduced, pivots = gf2.rref(gf2.pack_rows(dense), n)
    expect, expect_pivots = _rref_dense_bruteforce(dense)
    assert pivots == expect_pivots
    assert np.array_equal(gf2.unpack_rows(reduced, n), expect)


def test_rank():
    eye = np.eye(6, dtype=np.uint8)
    assert gf2.rank(gf2.pack_rows(eye), 6) == 6
    dup = np.vstack([eye, eye[0:2]])
    assert gf2.rank(gf2.pack_rows(dup), 6) == 6


def test_matmul_t_and_matvec():
    rng = np.random.default_rng(3)
    A = rng.integers(0, 2, (5, 70), dtype=np.uint8)
    B = rng.integers(0, 2, (4, 70), dtype=np.uint8)
    got = gf2.matmul_t(gf2.pack_rows(A), gf2.pack_rows(B))
    expect = (A.astype(np.int64) @ B.T) & 1
    assert np.array_equal(got, expect)

    v = rng.integers(0, 2, 70, dtype=np.uint8)
    got_v = gf2.matvec(gf2.pack_rows(A), gf2.pack_rows(v[None])[0])
    assert np.array_equal(got_v, (A.astype(np.int64) @ v) & 1)


def test_solve_unit_lower_triangular():
    rng = np.random.default_rng(4)
    t = 12
    T = np.tril(rng.integers(0, 2, (t, t), dtype=np.uint8), k=-1)
    np.fill_diagonal(T, 1)
    x_true = rng.integers(0, 2, (t, 3), dtype=np.uint8)
    b = (T.astype(np.int64) @ x_true) & 1
    x = gf2.solve_unit_lower_triangular(T, b.astype(np.uint8))
    assert np.array_equal(x, x_true)
    # single RHS
    x1 = gf2.solve_unit_lower_triangular(T, b[:, 0].astype(np.uint8))
    assert np.array_equal(x1, x_true[:, 0])


def test_invert():
    rng = np.random.default_rng(5)
    for _ in range(5):
        t = 8
        # random invertible: accumulate until full rank
        while True:
            A = rng.integers(0, 2, (t, t), dtype=np.uint8)
            if gf2.rank(gf2.pack_rows(A), t) == t:
                break
        inv = gf2.invert(A)
        assert inv is not None
        assert np.array_equal((A.astype(np.int64) @ inv) & 1, np.eye(t, dtype=np.int64))
    singular = np.zeros((3, 3), dtype=np.uint8)
    assert gf2.invert(singular) is None
    assert gf2.invert(np.zeros((0, 0), dtype=np.uint8)).shape == (0, 0)
