"""Park-Miller LCG compat generator vs the reference implementation."""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest

from ldpc_tpu.utils.legacy_rng import (
    IDUM1,
    IDUM2,
    ParkMillerGauss,
    lcg_stream,
)

_REF = "/root/reference/python_ldpc_app/generator.py"


def _load_reference_generator():
    if not os.path.exists(_REF):
        pytest.skip("reference generator not available")
    spec = importlib.util.spec_from_file_location("ref_generator", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.Generator


def test_lcg_matches_reference_stream():
    Generator = _load_reference_generator()
    ref = Generator(IDUM1, 1.0)
    ref_stream = [ref.ran() for _ in range(1000)]
    np.testing.assert_array_equal(lcg_stream(IDUM1, 1000), ref_stream)


def test_gauss_matches_reference_branching():
    Generator = _load_reference_generator()
    for idum, sigma in [(IDUM1, 0.7), (IDUM2, 1.3)]:
        ref = Generator(idum, sigma)
        ours = ParkMillerGauss(idum, sigma)
        ref_seq = [ref.gauss(b) for b in range(256)]
        np.testing.assert_allclose(
            ours.gauss_sequence(256), ref_seq, rtol=0, atol=0
        )


def test_known_statistics():
    g = ParkMillerGauss(IDUM2, 2.0)
    x = g.gauss_sequence(20000)
    assert abs(x.mean()) < 0.05
    assert abs(x.std() - 2.0) < 0.05


def test_reference_noise_replay_bug_demonstration():
    """Two generators with the same seed produce the SAME stream -- this is
    why the reference's per-process channels (re-seeded identically,
    channel.py:26-34) replay identical mode-2/3 noise in every block."""
    a = ParkMillerGauss(IDUM1, 1.0).gauss_sequence(64)
    b = ParkMillerGauss(IDUM1, 1.0).gauss_sequence(64)
    np.testing.assert_array_equal(a, b)
