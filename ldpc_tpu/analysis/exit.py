"""EXIT (extrinsic information transfer) chart analysis for LDPC ensembles.

Complements the sampled density evolution in
:mod:`ldpc_tpu.analysis.density_evolution` with the closed-form Gaussian
approximation (ten Brink's EXIT method): each message population is modeled
as a *consistent* Gaussian LLR (variance = 2 x mean), so the whole decoder
state collapses to one number per half-iteration -- the mutual information
I between a message and its bit. The variable-node and check-node transfer
curves then predict convergence geometrically: belief propagation succeeds
iff the VND curve stays strictly above the (inverted) CND curve, and the
"tunnel" between them is the iteration trajectory. The reference simulator
(omkuprin7/ldpc-simulator) ships no analysis tooling at all
(`python_ldpc_app/` has simulation only); this module answers code-design
questions ("why does WiMAX converge 0.3 dB before the regular ensemble?")
in milliseconds, without Monte-Carlo noise.

Everything is closed-form quadrature over the degree distribution -- the
J-function is evaluated with Gauss-Hermite quadrature rather than the usual
published polynomial fits, so the accuracy is set by the quadrature order
(200 nodes: |error| < 1e-9 over the whole sigma range, verified against
adaptive trapezoid integration in tests/test_exit.py), not by a curve fit.

Conventions: BPSK on AWGN, channel LLR variance sigma_ch^2 = 8 R Eb/N0
(consistent-Gaussian channel messages); edge-perspective degree
distributions lambda/rho as {degree: edge fraction} dicts.

VND:  I_E = sum_d lambda_d J( sqrt((d-1) Jinv(I_A)^2 + sigma_ch^2) )
CND:  I_E = 1 - sum_d rho_d J( sqrt(d-1) Jinv(1 - I_A) )   (dual approx.)
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "j_function",
    "j_inverse",
    "edge_degree_distributions",
    "vnd_curve",
    "cnd_curve",
    "exit_curves",
    "tunnel_gap",
    "exit_threshold",
]

# 200-point Gauss-Hermite: the log2(1+e^-l) transition region (|l| < ~5)
# shrinks relative to the node spread as sigma grows, so a high order is
# needed to keep |error| < 1e-9 across the whole sigma range (tested).
_GH_T, _GH_W = np.polynomial.hermite.hermgauss(200)
_LN2 = math.log(2.0)


def j_function(sigma) -> np.ndarray:
    """Mutual information J(sigma) of a consistent Gaussian LLR.

    L ~ N(sigma^2/2, sigma^2) given bit 0: J = 1 - E[log2(1 + e^-L)].
    Vectorized over ``sigma`` (>= 0); J(0) = 0, J(inf) -> 1.
    """
    s = np.asarray(sigma, dtype=np.float64)
    scalar = s.ndim == 0
    s = np.atleast_1d(s)
    # l = sqrt(2) sigma t + sigma^2/2 maps GH nodes onto the LLR density
    l = math.sqrt(2.0) * s[..., None] * _GH_T + 0.5 * s[..., None] ** 2
    # log2(1+e^-l) via logaddexp for overflow safety at l << 0
    integrand = np.logaddexp(0.0, -l) / _LN2
    out = 1.0 - (integrand @ _GH_W) / math.sqrt(math.pi)
    out = np.clip(out, 0.0, 1.0)
    return float(out[0]) if scalar else out


# dense inversion grid: J spans (0, 1) for sigma in (0, ~40); geometric
# spacing resolves both the sigma->0 quadratic regime and the saturating tail
_SIGMA_GRID = np.concatenate([[0.0], np.geomspace(1e-3, 60.0, 4096)])
_J_GRID = j_function(_SIGMA_GRID)


def j_inverse(i) -> np.ndarray:
    """sigma such that J(sigma) = i (monotone interpolation; i in [0, 1))."""
    i_arr = np.asarray(i, dtype=np.float64)
    out = np.interp(np.clip(i_arr, 0.0, _J_GRID[-1]), _J_GRID, _SIGMA_GRID)
    return float(out) if i_arr.ndim == 0 else out


def edge_degree_distributions(graph) -> tuple[dict[int, float], dict[int, float]]:
    """Edge-perspective (lambda, rho) of a protograph / QC base graph.

    Accepts whatever :mod:`density_evolution` accepts (QCLayout, base-edge
    list). lambda[d] = fraction of edges incident to degree-d variable
    types; rho[d] likewise for checks. Multi-edges count with multiplicity,
    matching the protograph semantics.
    """
    from ldpc_tpu.analysis.density_evolution import _edges_of

    edges = _edges_of(graph)
    ne = len(edges)
    vdeg: dict[int, int] = {}
    cdeg: dict[int, int] = {}
    for c, v in edges:
        vdeg[v] = vdeg.get(v, 0) + 1
        cdeg[c] = cdeg.get(c, 0) + 1
    lam: dict[int, float] = {}
    rho: dict[int, float] = {}
    for d in vdeg.values():
        lam[d] = lam.get(d, 0.0) + d / ne
    for d in cdeg.values():
        rho[d] = rho.get(d, 0.0) + d / ne
    return lam, rho


def _sigma_ch(ebno_db: float, rate: float) -> float:
    return math.sqrt(8.0 * rate * 10.0 ** (ebno_db / 10.0))


def vnd_curve(i_a, lam: dict[int, float], ebno_db: float, rate: float):
    """Variable-node transfer I_E(I_A) for edge distribution ``lam``."""
    i_a = np.asarray(i_a, dtype=np.float64)
    s_a2 = j_inverse(i_a) ** 2
    s_ch2 = _sigma_ch(ebno_db, rate) ** 2
    out = np.zeros_like(i_a)
    for d, frac in lam.items():
        out = out + frac * j_function(np.sqrt((d - 1) * s_a2 + s_ch2))
    return out


def cnd_curve(i_a, rho: dict[int, float]):
    """Check-node transfer I_E(I_A) (dual/reciprocal-channel approximation)."""
    i_a = np.asarray(i_a, dtype=np.float64)
    s_dual = j_inverse(1.0 - i_a)
    out = np.zeros_like(i_a)
    for d, frac in rho.items():
        out = out + frac * j_function(math.sqrt(max(d - 1, 0)) * s_dual)
    return 1.0 - out


def exit_curves(
    graph_or_dists,
    ebno_db: float,
    rate: float,
    n_points: int = 256,
):
    """(i_a, vnd, cnd_inv) arrays for plotting / tunnel analysis.

    ``cnd_inv`` is the CND curve with axes swapped onto the VND axes (the
    standard EXIT chart presentation): cnd_inv[k] is the a-priori input the
    CND needs to EMIT i_a[k]. The tunnel is open where vnd > cnd_inv.
    ``graph_or_dists``: a protograph (QCLayout / edge list) or an explicit
    ``(lam, rho)`` tuple.
    """
    lam, rho = (
        graph_or_dists
        if isinstance(graph_or_dists, tuple)
        else edge_degree_distributions(graph_or_dists)
    )
    i_a = np.linspace(0.0, 1.0 - 1e-9, n_points)
    vnd = vnd_curve(i_a, lam, ebno_db, rate)
    cnd = cnd_curve(i_a, rho)
    # monotone inversion of the CND curve onto the output axis
    cnd_inv = np.interp(i_a, cnd, i_a)
    return i_a, vnd, cnd_inv


def tunnel_gap(graph_or_dists, ebno_db: float, rate: float,
               n_points: int = 256) -> float:
    """min_I [VND(I) - CND^-1(I)]: positive iff the decoding tunnel is open."""
    _, vnd, cnd_inv = exit_curves(graph_or_dists, ebno_db, rate, n_points)
    return float(np.min(vnd - cnd_inv))


def exit_threshold(
    graph_or_dists,
    rate: float,
    lo_db: float = -1.0,
    hi_db: float = 6.0,
    tol_db: float = 0.01,
    n_points: int = 512,
) -> float:
    """Gaussian-approximation BP threshold: lowest Eb/N0 with an open tunnel.

    Bisection on :func:`tunnel_gap`. Typically within ~0.1 dB of true
    density evolution for AWGN LDPC ensembles -- cross-check against
    :func:`density_evolution.protograph_threshold` when the call budget
    allows. Raises if the threshold is outside [lo_db, hi_db].
    """
    lam_rho = (
        graph_or_dists
        if isinstance(graph_or_dists, tuple)
        else edge_degree_distributions(graph_or_dists)
    )
    if tunnel_gap(lam_rho, hi_db, rate, n_points) <= 0:
        raise ValueError(f"tunnel closed at hi_db={hi_db}; raise hi_db")
    if tunnel_gap(lam_rho, lo_db, rate, n_points) > 0:
        raise ValueError(f"tunnel already open at lo_db={lo_db}; lower lo_db")
    lo, hi = lo_db, hi_db
    while hi - lo > tol_db:
        mid = 0.5 * (lo + hi)
        if tunnel_gap(lam_rho, mid, rate, n_points) > 0:
            hi = mid
        else:
            lo = mid
    return 0.5 * (lo + hi)
