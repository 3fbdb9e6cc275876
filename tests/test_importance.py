"""Importance-sampled FER estimator (ldpc_tpu.analysis.importance).

The load-bearing test is UNBIASEDNESS: at a moderate SNR where plain MC
sees plenty of failures, the defensive-mixture IS estimate (shifted toward
arbitrary supports -- deliberately NOT the true error events) must
reproduce the plain-MC FER within combined confidence intervals. That is
the property that makes the deep-SNR numbers trustworthy where no MC
cross-check exists.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from ldpc_tpu.analysis.importance import (
    ISResult,
    estimate_point,
    make_is_step,
    orbit_supports,
)
from ldpc_tpu.sim.config import SimOptions
from ldpc_tpu.sim.runner import PointExecutor, load_code


def _opts(batch, iterations=8):
    return SimOptions(
        matrix="builtin:CCSDS_ldpc_n32_k16.alist.txt", blocks=batch,
        iterations=iterations, ber=True, fer=True, fidelity="exact",
        exact_ber=True, batch=batch, seed=0, speed=0.5, quiet=True,
    )


@pytest.fixture(scope="module")
def ccsds():
    return load_code("builtin:CCSDS_ldpc_n32_k16.alist.txt")


def test_orbit_supports_expansion(ccsds):
    Z, n = ccsds.qc.Z, ccsds.n
    sups = orbit_supports([[0, 5], [1]], Z, n)
    # 2 base supports x Z shifts, all distinct here
    assert sups.shape == (2 * Z, n)
    assert set(np.unique(sups.sum(axis=1))) == {1.0, 2.0}
    # shift t of [0, 5]: {(0 // Z)*Z + t, ...} stays inside the base blocks
    row0 = np.flatnonzero(sups[0])
    row1 = np.flatnonzero(sups[1])
    assert row0.tolist() == [0, 5]
    assert (row1 % Z != row0 % Z).all() or (row1 // Z == row0 // Z).all()


def test_orbit_supports_dedup():
    # a support invariant under every shift collapses to one component
    Z, n = 4, 8
    sups = orbit_supports([[0, 1, 2, 3]], Z, n)
    assert sups.shape == (1, n)


def test_weights_bounded_and_mean_one(ccsds):
    """Defensive mixture: w <= 1/pi0 always; E_q[w] ~ 1 (consistency)."""
    batch = 2048
    opts = _opts(batch)
    sups = orbit_supports([[0, 3, 17]], ccsds.qc.Z, ccsds.n)
    res = estimate_point(ccsds, opts, 3.0, sups, frames=4 * batch,
                         pi0=0.25, seed=1)
    assert res.max_weight <= 1.0 / 0.25 + 1e-6
    assert abs(res.mean_weight - 1.0) < 0.05


def test_is_matches_plain_mc(ccsds):
    """Unbiasedness: IS (with arbitrary shift targets) == plain MC within
    combined 4-sigma at an SNR where MC resolves the FER well."""
    batch = 2048
    snr = 2.0
    opts = _opts(batch)

    mc_frames = 16 * batch
    ex = PointExecutor(ccsds, opts)
    stats = ex.run_point(snr, mc_frames, jax.random.key(123), 0)
    mc_fer = stats.fer_frames / stats.blocks
    mc_std = np.sqrt(mc_fer * (1 - mc_fer) / mc_frames)
    assert stats.fer_frames >= 50, "operating point too clean for the test"

    sups = orbit_supports([[0, 7, 19], [2, 11]], ccsds.qc.Z, ccsds.n)
    res = estimate_point(ccsds, opts, snr, sups, frames=16 * batch,
                         pi0=0.3, seed=5)
    tol = 4.0 * np.hypot(mc_std, res.fer_std)
    assert abs(res.fer - mc_fer) < tol, (
        f"IS {res.fer:.5f}+-{res.fer_std:.5f} vs MC {mc_fer:.5f}"
        f"+-{mc_std:.5f}"
    )
    # WER >= FER by construction (wrong = detected | undetected)
    assert res.wer >= res.fer - 1e-12


def test_is_step_requires_exact_mode1(ccsds):
    sups = orbit_supports([[0]], ccsds.qc.Z, ccsds.n)
    bad = SimOptions(**{**_opts(64).__dict__, "mode": 2})
    with pytest.raises(ValueError, match="mode 1"):
        make_is_step(ccsds, bad, sups)
    legacy = SimOptions(**{**_opts(64).__dict__, "fidelity": "reference"})
    with pytest.raises(ValueError, match="exact"):
        make_is_step(ccsds, legacy, sups)


def test_isresult_roundtrip():
    r = ISResult(5.0, 1000, 1e-9, 1e-10, 2e-9, 1e-10, 1e-9, 5e-11,
                 1.0, 3.2, 17)
    d = r.to_dict()
    assert d["snr_db"] == 5.0 and d["fail_frames"] == 17


def test_harvest_failures_returns_supports(ccsds):
    """Depth-harvest hook: residual supports of the IS sampler's own
    failures come back deduplicated and size-capped, and refeeding them
    through orbit_supports grows (or keeps) the mixture."""
    from ldpc_tpu.analysis.importance import harvest_failures

    opts = _opts(256, iterations=4)
    base = [[0, 5, 9]]
    shifts = orbit_supports(base, ccsds.qc.Z, ccsds.n)
    sups = harvest_failures(
        ccsds, opts, shifts, 2.0, frames=512, max_support=12, min_count=1,
        say=lambda *a, **k: None,
    )
    assert sups, "at 2 dB the sampler must produce failures"
    assert len({tuple(s) for s in sups}) == len(sups)
    for s in sups:
        assert 0 < len(s) <= 12
        assert s == sorted(s)
    grown = orbit_supports(base + sups, ccsds.qc.Z, ccsds.n)
    assert grown.shape[0] >= shifts.shape[0]
