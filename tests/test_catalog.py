"""Matrix catalog tests (mirrors the reference's tests/test_matrix_catalog.py),
run against the real ALIST database when present."""

import pytest

from ldpc_tpu.models.catalog import MatrixCatalog


@pytest.fixture(scope="module")
def catalog(matrix_db):
    return MatrixCatalog(matrix_db)


def test_scan_nonempty(catalog):
    assert len(catalog) > 100


def test_bch_parsed(catalog):
    bch = catalog.get_by_family("bch")
    assert len(bch) == 1
    assert bch[0].n == 7 and bch[0].k == 4


def test_wimax_rates(catalog):
    wimax = catalog.get_by_family("wimax")
    assert len(wimax) >= 90
    assert 0.5 in {m.rate for m in wimax}
    assert any(m.n == 576 for m in wimax)


def test_rate_range_filter(catalog):
    mid = catalog.get_by_rate_range(0.6, 0.7)
    assert mid
    assert all(0.6 <= m.rate <= 0.7 for m in mid)


def test_nearest_rate(catalog):
    m = catalog.get_nearest_rate(0.5, family="wimax", block_size=576)
    assert m is not None and m.rate == 0.5 and m.n == 576


def test_lower_higher_navigation(catalog):
    cur = catalog.get_nearest_rate(0.66, family="wimax", block_size=576)
    lower = catalog.get_lower_rate(cur)
    higher = catalog.get_higher_rate(cur)
    assert lower is not None and lower.rate < cur.rate
    assert higher is not None and higher.rate > cur.rate
    # prefer same block size
    assert lower.n == cur.n and higher.n == cur.n


def test_lowest_rate_has_no_lower(catalog):
    wimax = catalog.get_by_family("wimax")
    lowest = min(wimax, key=lambda m: m.rate)
    assert catalog.get_lower_rate(lowest) is None


def test_find_by_path(catalog, bch_matrix_path):
    info = catalog.find_by_path(bch_matrix_path)
    assert info is not None and info.family == "bch"


def test_header_fallback_families(catalog):
    # WRAN .txt files parse via the WRAN pattern; unknowns via the header
    fams = {m.family for m in catalog.matrices}
    assert "wran" in fams
    assert all(m.n > 0 and m.m > 0 for m in catalog.matrices)


def test_repr(catalog):
    r = repr(catalog)
    assert "MatrixCatalog" in r and "wimax" in r
