"""ALIST parser unit tests (dialect of python_ldpc_app/utils.py:21-108)."""

import numpy as np
import pytest

from ldpc_tpu.models.alist import read_alist
from ldpc_tpu.models.generate import gallager_regular, hamming_7_4, write_alist


def _write(tmp_path, text):
    p = tmp_path / "m.alist.txt"
    p.write_text(text)
    return str(p)


def test_parse_simple(tmp_path):
    # 4 cols, 2 rows; H = [[1,1,0,0],[0,0,1,1]]
    text = "\n".join(
        [
            "4 2",
            "1 2",
            "1 1 1 1",
            "2 2",
            "1", "1", "2", "2",
            "1 2",
            "3 4",
            "",
        ]
    )
    a = read_alist(_write(tmp_path, text))
    assert (a.n, a.m, a.nnz) == (4, 2, 4)
    assert np.array_equal(a.to_dense(), [[1, 1, 0, 0], [0, 0, 1, 1]])


def test_zero_padding_skipped(tmp_path):
    # fixed-width rows padded with 0 entries must be ignored
    text = "\n".join(
        [
            "4 2",
            "1 2",
            "1 1 1 0",
            "2 1",
            "1", "1", "2", "0",
            "1 2",
            "3 0",
            "",
        ]
    )
    a = read_alist(_write(tmp_path, text))
    assert a.nnz == 3
    assert np.array_equal(a.to_dense(), [[1, 1, 0, 0], [0, 0, 1, 0]])


def test_header_order_is_cols_first(bch_matrix_path):
    a = read_alist(bch_matrix_path)
    assert a.n == 7 and a.m == 3  # BCH(7,4): 7 variables, 3 checks


def test_weight_count_mismatch_raises(tmp_path):
    text = "4 2\n1 2\n1 1 1\n2 2\n"
    with pytest.raises(ValueError, match="Column weights count mismatch"):
        read_alist(_write(tmp_path, text))


def test_out_of_range_index_raises(tmp_path):
    text = "\n".join(
        ["2 1", "1 2", "1 1", "2", "1", "1", "1 3", ""]
    )
    with pytest.raises(ValueError, match="Invalid column index"):
        read_alist(_write(tmp_path, text))


def test_truncated_file_raises(tmp_path):
    with pytest.raises(ValueError, match="Unexpected end of file"):
        read_alist(_write(tmp_path, "4 2\n1 2\n1 1 1 1\n2 2\n1\n1\n"))


def test_empty_dimensions_raise(tmp_path):
    with pytest.raises(ValueError):
        read_alist(_write(tmp_path, "\n"))
    with pytest.raises(ValueError, match="Invalid dimensions"):
        read_alist(_write(tmp_path, "0 3\n"))


def test_writer_roundtrip(tmp_path):
    a = gallager_regular(24, 3, 6, seed=5)
    path = str(tmp_path / "gen.alist.txt")
    write_alist(a, path)
    b = read_alist(path)
    assert np.array_equal(a.to_dense(), b.to_dense())


def test_hamming_roundtrip(tmp_path):
    a = hamming_7_4()
    path = str(tmp_path / "h74.alist.txt")
    write_alist(a, path)
    b = read_alist(path)
    assert np.array_equal(a.to_dense(), b.to_dense())
    assert b.row_degrees().tolist() == [4, 4, 4]


def test_degrees(small_code):
    H = small_code.H
    assert (H.row_degrees() == 6).all()
    assert (H.col_degrees() == 3).all()
