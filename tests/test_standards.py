"""Built-in standard code construction (ldpc_tpu.models.standards).

The decisive check: every one of the reference database's 119 files must be
reproduced EXACTLY (bit-for-bit H equality) by the corresponding built-in
constructor -- the shift tables are the published standards constants, and
the scaling rule floor(p * Z / Z0) must match every lift size.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from ldpc_tpu.models import standards
from ldpc_tpu.models.alist import read_alist
from ldpc_tpu.models.code import LDPCCode
from ldpc_tpu.utils.db import default_matrix_db


def _db() -> str:
    db = default_matrix_db()
    if db is None:
        pytest.skip("no ALIST database available for cross-validation")
    return db


def _find(db: str, name: str) -> str | None:
    for root, _dirs, files in os.walk(db):
        if name in files:
            return os.path.join(root, name)
    return None


def test_every_builtin_matches_reference_database():
    db = _db()
    missing, checked = [], 0
    for name in standards.builtin_names():
        path = _find(db, name)
        if path is None:
            missing.append(name)
            continue
        ours = standards.make_builtin(name)
        ref = read_alist(path)
        assert (ours.n, ours.m) == (ref.n, ref.m), name
        assert np.array_equal(ours.to_dense(), ref.to_dense()), (
            f"built-in {name} does not reproduce the database file"
        )
        checked += 1
    # the reference DB has 119 files; all of them must be covered & equal
    assert checked >= 119, f"only {checked} builtins verified; missing: {missing}"


def test_builtin_count_and_names():
    names = standards.builtin_names()
    assert len(names) == 119
    assert "wimax_1152_0.5.alist.txt" in names
    assert "BCH_7_4_1_strip.alist.txt" in names
    assert standards.is_builtin("builtin:wimax_576_0.83.alist.txt")
    assert standards.is_builtin("/any/dir/wimax_576_0.83.alist.txt")
    assert not standards.is_builtin("no_such_code.alist.txt")


def test_wimax_shapes_and_rates():
    for rate, m_frac in [("1/2", 0.5), ("2/3B", 1 / 3), ("3/4A", 0.25),
                         ("3/4B", 0.25), ("5/6", 1 / 6)]:
        al = standards.wimax(1152, rate)
        assert al.n == 1152
        assert al.m == round(1152 * m_frac)


def test_wimax_codes_are_full_rank_and_qc():
    from ldpc_tpu.models.qc import detect_qc

    for rate in standards.WIMAX_RATES:
        al = standards.wimax(576, rate)
        code = LDPCCode(alist=al, name=f"wimax_576_{rate}")
        assert not code.rank_deficient
        qc = detect_qc(al)
        assert qc is not None and qc.Z == 24


def test_tanner_structure():
    al = standards.tanner_155()
    assert (al.n, al.m) == (155, 93)
    assert (al.row_degrees() == 5).all()
    assert (al.col_degrees() == 3).all()


def test_ccsds_weight_two_blocks():
    al = standards.ccsds(128)
    assert (al.n, al.m) == (128, 64)
    code = LDPCCode(alist=al, name="ccsds_128")
    assert code.k in (64, 65)  # protograph rank deficiency gives k >= n/2


def test_expand_base_rejects_collisions():
    table = ((  (0, 4),),)  # both shifts scale to 0 when Z0=16 -> Z=2
    with pytest.raises(ValueError):
        standards.expand_base(table, Z=2, Z0=16)


def test_builtin_decodes_end_to_end():
    """A built-in WiMAX code runs the full pipeline without a database."""
    import jax

    from ldpc_tpu.ops.channel import ChannelParams, make_channel_fn
    from ldpc_tpu.ops.encode import make_encoder, random_info_bits
    from ldpc_tpu.ops.spa import make_decoder

    code = LDPCCode(alist=standards.wimax(576, "1/2"), name="wimax_576_0.5")
    spec = code.standard_encode_spec
    enc = make_encoder(spec, "orig")
    chan = make_channel_fn(1, 1)
    dec = make_decoder(code.layout("orig"), spec.info_pos("orig"), 10, "spa")

    key = jax.random.key(0)
    u = random_info_bits(key, 8, code.k)
    w = enc(u)
    llr = chan(key, w, ChannelParams(snr_db=3.0, noise_model="exact").consts())
    res = dec(llr)
    assert bool(res.ok.all())


def test_resolve_matrix_builtin_without_database(monkeypatch):
    """Builtin names resolve with no database on disk."""
    from ldpc_tpu.utils import db

    monkeypatch.setattr(db, "default_matrix_db", lambda: None)
    assert db.resolve_matrix("wimax_1152_0.5.alist.txt") == (
        "builtin:wimax_1152_0.5.alist.txt"
    )
    assert db.resolve_matrix("builtin:Tanner_155_64.alist.txt").startswith("builtin:")
    with pytest.raises(FileNotFoundError):
        db.resolve_matrix("no_such_matrix.alist.txt")


def test_load_code_builtin():
    from ldpc_tpu.sim.runner import load_code

    code = load_code("builtin:CCSDS_ldpc_n128_k64.alist.txt")
    assert code.n == 128
    assert code.name == "CCSDS_ldpc_n128_k64.alist.txt"


def test_builtin_catalog_navigation():
    from ldpc_tpu.models.catalog import MatrixCatalog

    cat = MatrixCatalog(None)  # builtins only
    assert len(cat) == 119
    info = cat.find_by_path("builtin:wimax_1152_0.5.alist.txt")
    assert info is not None and info.n == 1152 and info.rate == 0.5
    higher = cat.get_higher_rate(info)
    assert higher is not None and higher.rate > 0.5 and higher.n == 1152
    lower = cat.get_lower_rate(higher)
    assert lower is not None and lower.rate == 0.5
    # bare names also resolve
    assert cat.find_by_path("wimax_576_0.83.alist.txt") is not None


def test_all_119_builtins_construct_as_codes():
    """Every built-in code must survive the full LDPCCode chain: RREF,
    rank handling, generator construction, G.H^T validation, edge layouts."""
    failures = []
    for name in standards.builtin_names():
        try:
            code = LDPCCode(alist=standards.make_builtin(name), name=name)
            assert code.k > 0 and code.layout("orig").n_edges > 0
        except Exception as e:  # pragma: no cover - failure reporting
            failures.append((name, repr(e)))
    assert not failures, failures
