"""Structural checks of the roofline op census (ldpc_tpu.analysis.roofline).

The census mirrors the fused kernel's body op for op; these tests pin the
identities that make it trustworthy without running the kernel: transcendental
counts are exact functions of the Tanner graph (tanh/log per edge for the SPA
rule), and the speed-of-light model is monotone in iteration count.
"""

from __future__ import annotations

import numpy as np
import pytest

from ldpc_tpu.analysis.roofline import (
    CLASSES,
    channel_census,
    decode_census,
    speed_of_light,
)
from ldpc_tpu.sim.runner import load_code


@pytest.fixture(scope="module")
def qc():
    return load_code("builtin:wimax_576_0.5.alist.txt").qc


def edge_elems(qc):
    return sum(len(r) for r in qc.row_slots()) * qc.Z


def test_spa_transcendentals_match_edges(qc):
    """SPA rule: exactly one tanh, one log and one divide per edge element
    per iteration (check update), regardless of schedule."""
    for schedule in ("flooding", "layered"):
        c = decode_census(qc, "spa", schedule).counts
        assert c["tanh"] == edge_elems(qc)
        assert c["log"] == edge_elems(qc)
        assert c["div"] == edge_elems(qc)


def test_minsum_has_no_transcendentals(qc):
    c = decode_census(qc, "normalized_minsum", "layered").counts
    assert c["tanh"] == c["log"] == c["div"] == 0
    assert c["fma"] > 0 and c["where"] > 0


def test_track_norm_adds_work(qc):
    base = decode_census(qc, "spa", "layered", track_norm=False).total()
    norm = decode_census(qc, "spa", "layered", track_norm=True).total()
    assert norm > base


def test_channel_census_modes(qc):
    """One normal pair (3 PRNG planes) per two base columns in mode 1;
    modes 2/3 draw a second pair; mode 2 adds the jam uniform plane."""
    npairs = (qc.nb + 1) // 2
    c1 = channel_census(qc, 1).counts
    c2 = channel_census(qc, 2).counts
    c3 = channel_census(qc, 3).counts
    assert c1["prng"] == 3 * qc.Z * npairs
    assert c3["prng"] == 6 * qc.Z * npairs
    assert c2["prng"] == 6 * qc.Z * npairs + qc.nb * qc.Z
    assert c1["log"] == c1["sqrt"] == npairs * qc.Z
    assert c1["cossin"] == 2 * npairs * qc.Z


def test_speed_of_light_monotone_in_iters(qc):
    rates = {c: 1e11 for c in CLASSES}
    lo = speed_of_light(qc, rates, k=288, mean_tile_iters=3.0)
    hi = speed_of_light(qc, rates, k=288, mean_tile_iters=12.0)
    assert hi["t_frame_s"] > lo["t_frame_s"]
    assert hi["ceiling_info_bits_per_s"] < lo["ceiling_info_bits_per_s"]
    # decomposition adds up
    np.testing.assert_allclose(
        lo["t_frame_s"], lo["t_fixed_s"] + 3.0 * lo["t_decode_iter_s"],
        rtol=1e-12,
    )


def test_all_counts_nonnegative(qc):
    for variant in ("spa", "minsum", "normalized_minsum", "offset_minsum"):
        for schedule in ("flooding", "layered"):
            c = decode_census(qc, variant, schedule)
            assert all(v >= 0 for v in c.counts.values())
            assert c.total() > 0
