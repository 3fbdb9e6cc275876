"""Puncturing / shortening (rate adaptation within one code)."""

from __future__ import annotations

import jax
import pytest

from ldpc_tpu.sim.config import SimOptions
from ldpc_tpu.sim.runner import PointExecutor, load_code


def _run(code, snr, **kw):
    opts = SimOptions(
        matrix=code.name, blocks=512, iterations=15, ber=True, fer=True,
        fidelity="exact", batch=512, seed=0, speed=0.5, quiet=True, **kw,
    )
    ex = PointExecutor(code, opts)
    stats = ex.run_point(snr, 512, jax.random.key(0), 0)
    return ex, stats


@pytest.fixture(scope="module")
def code():
    return load_code("builtin:wimax_576_0.5.alist.txt")


def test_effective_rate_and_ber_denominator(code):
    ex, stats = _run(code, 2.5, shorten=48, puncture=48)
    assert ex.k_active == 240
    assert ex.effective_rate == pytest.approx(240 / 480)
    # BER accounting uses k_active (via build_point_result callers)
    assert stats.blocks == 512


def test_shortening_improves_fer(code):
    """Fixing info bits adds known values -> lower effective rate -> fewer
    failures at the same channel SNR."""
    _, base = _run(code, 2.0)
    _, short = _run(code, 2.0, shorten=96)
    assert short.fer_frames < base.fer_frames


def test_puncturing_degrades_fer(code):
    """Erasing parity bits raises the rate -> more failures at the same SNR."""
    _, base = _run(code, 2.5)
    _, punct = _run(code, 2.5, puncture=96)
    assert punct.fer_frames > base.fer_frames


def test_shortened_bits_never_counted_as_errors(code):
    """With everything shortened except a few bits, error counts stay within
    the active bit budget."""
    ex, stats = _run(code, 0.0, shorten=code.k - 16)
    assert ex.k_active == 16
    assert stats.error_bits <= 16 * stats.blocks


def test_bounds_validation(code):
    with pytest.raises(ValueError, match="shorten"):
        _run(code, 2.0, shorten=code.k)
    with pytest.raises(ValueError, match="puncture"):
        _run(code, 2.0, puncture=code.n - code.k)
