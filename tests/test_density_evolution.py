"""Protograph density evolution (ldpc_tpu.analysis.density_evolution).

Anchor: the (3,6)-regular BP threshold on BPSK-AWGN is Eb/N0 ~= 1.11 dB
(Richardson & Urbanke). Sampled DE with finite populations lands within a
tenth of a dB or two.
"""

from __future__ import annotations

import pytest

from ldpc_tpu.analysis import (
    de_error_probability,
    protograph_threshold,
    regular_protograph,
)
from ldpc_tpu.models.qc import detect_qc
from ldpc_tpu.models.standards import wimax


def test_regular_protograph_structure():
    edges = regular_protograph(3, 6)
    assert len(edges) == 6
    from collections import Counter

    assert Counter(c for c, _ in edges) == {0: 6}
    assert Counter(v for _, v in edges) == {0: 3, 1: 3}


def test_de_far_from_threshold():
    proto = regular_protograph(3, 6)
    # well above threshold: BP must clean up completely
    assert de_error_probability(proto, 3.0, 0.5, iterations=60,
                                n_samples=4000) < 1e-3
    # well below: stuck near the channel error rate
    assert de_error_probability(proto, -1.0, 0.5, iterations=60,
                                n_samples=4000) > 0.01


def test_regular_3_6_threshold_matches_literature():
    thr = protograph_threshold(
        regular_protograph(3, 6), rate=0.5, lo_db=0.5, hi_db=2.0,
        tol_db=0.06, iterations=150, n_samples=12000,
    )
    assert thr == pytest.approx(1.11, abs=0.2), thr


def test_wimax_beats_regular_ensemble():
    """The optimized 802.16e rate-1/2 protograph converges at 1.0 dB --
    BELOW the (3,6)-regular threshold (1.11 dB), where the regular ensemble
    is still stuck. (Single-point comparison: the full wimax bisection is
    accurate -- threshold ~0.8 dB, literature value -- but needs minutes of
    CPU; see ldpc_tpu.analysis docstring.)"""
    qc = detect_qc(wimax(576, "1/2"))
    pe_wimax = de_error_probability(qc, 1.0, 0.5, iterations=200,
                                    n_samples=4000)
    pe_reg = de_error_probability(regular_protograph(3, 6), 1.0, 0.5,
                                  iterations=200, n_samples=4000)
    assert pe_wimax < 1e-3, pe_wimax
    assert pe_reg > 0.01, pe_reg


def test_threshold_bracket_validation():
    proto = regular_protograph(3, 6)
    with pytest.raises(ValueError, match="above hi_db"):
        protograph_threshold(proto, 0.5, lo_db=-2.0, hi_db=0.0,
                             iterations=40, n_samples=2000)
    with pytest.raises(ValueError, match="below lo_db"):
        protograph_threshold(proto, 0.5, lo_db=3.0, hi_db=5.0,
                             iterations=40, n_samples=2000)


def test_bec_threshold_3_6_anchor():
    from ldpc_tpu.analysis import bec_threshold

    thr = bec_threshold(regular_protograph(3, 6))
    assert thr == pytest.approx(0.4294, abs=0.002), thr


def test_bec_wimax_threshold_near_capacity():
    """Rate-1/2 BEC capacity is eps = 0.5; the 802.16e protograph should get
    within ~0.02 of it (and clearly beat the (3,6) ensemble's 0.4294)."""
    from ldpc_tpu.analysis import bec_threshold

    qc = detect_qc(wimax(576, "1/2"))
    thr = bec_threshold(qc)
    assert 0.43 < thr < 0.5, thr


def test_bec_fixed_point_extremes():
    from ldpc_tpu.analysis import bec_erasure_fixed_point

    proto = regular_protograph(3, 6)
    assert bec_erasure_fixed_point(proto, 0.05) < 1e-12
    assert bec_erasure_fixed_point(proto, 0.9) > 0.1
