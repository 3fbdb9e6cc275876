"""EXIT chart analysis (ldpc_tpu.analysis.exit).

Anchors: J is a proper MI (monotone, J(0)=0, J(inf)->1, consistent with
direct numerical integration); the (3,6)-regular Gaussian-approximation
threshold lands near the true DE value 1.11 dB (Richardson & Urbanke); the
optimized 802.16e protograph opens its tunnel below the regular ensemble.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from ldpc_tpu.analysis.density_evolution import regular_protograph
from ldpc_tpu.analysis.exit import (
    cnd_curve,
    edge_degree_distributions,
    exit_curves,
    exit_threshold,
    j_function,
    j_inverse,
    tunnel_gap,
    vnd_curve,
)
from ldpc_tpu.models.qc import detect_qc
from ldpc_tpu.models.standards import wimax


def test_j_function_properties():
    s = np.linspace(0.0, 30.0, 400)
    j = j_function(s)
    assert j[0] == 0.0
    assert np.all(np.diff(j) >= -1e-12)  # monotone
    assert j[-1] == pytest.approx(1.0, abs=1e-6)
    # brute-force trapezoid cross-check at a few points
    for sigma in (0.5, 1.0, 2.0, 4.0):
        l = np.linspace(-40.0, 60.0, 200_001)
        pdf = np.exp(-((l - sigma**2 / 2.0) ** 2) / (2.0 * sigma**2)) / (
            sigma * math.sqrt(2.0 * math.pi)
        )
        brute = 1.0 - np.trapezoid(pdf * np.log2(1.0 + np.exp(-l)), l)
        assert j_function(sigma) == pytest.approx(brute, abs=1e-8)


def test_j_inverse_roundtrip():
    i = np.linspace(0.001, 0.999, 97)
    assert np.allclose(j_function(j_inverse(i)), i, atol=2e-4)


def test_edge_degree_distributions_regular():
    lam, rho = edge_degree_distributions(regular_protograph(3, 6))
    assert lam == {3: pytest.approx(1.0)}
    assert rho == {6: pytest.approx(1.0)}


def test_curves_are_monotone_and_bounded():
    lam, rho = edge_degree_distributions(regular_protograph(3, 6))
    i_a = np.linspace(0.0, 1.0 - 1e-9, 64)
    v = vnd_curve(i_a, lam, 1.5, 0.5)
    c = cnd_curve(i_a, rho)
    for y in (v, c):
        assert np.all(np.diff(y) >= -1e-9)
        assert np.all((y >= 0.0) & (y <= 1.0))


def test_regular_3_6_exit_threshold_near_de():
    """Gaussian-approximation threshold of the (3,6) ensemble: true DE says
    1.11 dB; the EXIT/GA estimate must land within ~0.2 dB."""
    thr = exit_threshold(regular_protograph(3, 6), rate=0.5, lo_db=0.0,
                         hi_db=3.0, tol_db=0.005)
    assert thr == pytest.approx(1.11, abs=0.2), thr


def test_wimax_tunnel_opens_before_regular():
    """The optimized 802.16e rate-1/2 degree profile buys ~0.2-0.3 dB over
    (3,6)-regular -- the EXIT threshold ordering must reflect it (same
    conclusion the sampled-DE test reaches by Monte Carlo)."""
    qc = detect_qc(wimax(576, "1/2"))
    thr_wimax = exit_threshold(qc, rate=0.5, lo_db=-0.5, hi_db=3.0)
    thr_reg = exit_threshold(regular_protograph(3, 6), rate=0.5,
                             lo_db=-0.5, hi_db=3.0)
    assert thr_wimax < thr_reg, (thr_wimax, thr_reg)
    assert thr_wimax == pytest.approx(0.84, abs=0.35), thr_wimax


def test_tunnel_gap_sign_flips_at_threshold():
    proto = regular_protograph(3, 6)
    thr = exit_threshold(proto, rate=0.5, lo_db=0.0, hi_db=3.0)
    assert tunnel_gap(proto, thr + 0.2, 0.5) > 0
    assert tunnel_gap(proto, thr - 0.2, 0.5) <= 0


def test_exit_curves_shapes_and_tunnel():
    i_a, vnd, cnd_inv = exit_curves(regular_protograph(3, 6), 2.0, 0.5)
    assert i_a.shape == vnd.shape == cnd_inv.shape
    # 2 dB is well above threshold: the tunnel must be open everywhere
    assert np.all(vnd > cnd_inv)


def test_plot_exit_chart_smoke(tmp_path):
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    from ldpc_tpu.sim.visualization import plot_exit_chart

    out = tmp_path / "exit.png"
    fig = plot_exit_chart(regular_protograph(3, 6), 2.0, 0.5,
                          save_path=str(out))
    assert out.exists() and out.stat().st_size > 0
    import matplotlib.pyplot as plt

    plt.close(fig)
