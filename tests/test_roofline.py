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


def test_two_phase_ceiling_above_single_pass(qc):
    """The two-phase op stream does LESS loop work at a straggler-bound
    operating point, so its honest ceiling must be HIGHER than the
    single-pass ceiling computed at the same measured single-pass trips
    (the round-3 verdict's point: dividing a two-phase numerator by the
    single-pass ceiling overstates the fraction of light)."""
    from ldpc_tpu.analysis.roofline import speed_of_light_two_phase

    rates = {c: 1e11 for c in CLASSES}
    # bench-like regime: single-pass tiles pinned at ~12 trips by stragglers,
    # phase 1 releases everything at 6, ~1/32 of tiles re-decode at 12
    model = {"single": 11.26, "phase1_mean": 6.0, "phase2_per_tile": 0.4,
             "refeed_frac": 0.008, "refeed_tile_frac": 1 / 32}
    single = speed_of_light(qc, rates, k=288, mean_tile_iters=11.26)
    two = speed_of_light_two_phase(
        qc, rates, k=288, phase1=6, trip_model=model,
    )
    assert (two["ceiling_info_bits_per_s"]
            > single["ceiling_info_bits_per_s"])
    # and the memory term is real but does not bind at this shape
    assert 0 < two["t_mem_s"] < two["t_compute_s"]
    assert two["t_frame_s"] == two["t_compute_s"]


def test_two_phase_ceiling_below_single_at_fer_one(qc):
    """At FER~1 phase 2 re-decodes everything: the two-phase stream does
    MORE work than single-pass, so its ceiling is lower -- matching the
    dispatch heuristic's refusal to split there."""
    from ldpc_tpu.analysis.roofline import speed_of_light_two_phase

    model = {"single": 12.0, "phase1_mean": 6.0, "phase2_per_tile": 12.0,
             "refeed_frac": 1.0, "refeed_tile_frac": 1.0}
    rates = {c: 1e11 for c in CLASSES}
    single = speed_of_light(qc, rates, k=288, mean_tile_iters=12.0)
    two = speed_of_light_two_phase(
        qc, rates, k=288, phase1=6, trip_model=model,
    )
    assert (two["ceiling_info_bits_per_s"]
            < single["ceiling_info_bits_per_s"])


def test_census_split_is_consistent(qc):
    """channel_census = fill + counter tail + init (the two-phase model
    reuses the tails for phase-2 accounting)."""
    from ldpc_tpu.analysis.roofline import counter_census, init_census

    whole = channel_census(qc, 1).total()
    tails = counter_census(qc).total() + init_census(qc).total()
    assert tails < whole
    assert init_census(qc).counts["fma"] == (
        qc.n + sum(len(r) for r in qc.row_slots()) * qc.Z
    )


def test_trip_model_exactness():
    """two_phase_trip_model reconstructs the kernels' per-tile while-loop
    trip counts exactly on a hand-built convergence profile."""
    from ldpc_tpu.sim.runner import two_phase_trip_model

    # 2 tiles of 128: tile 0 all conv at iter 2 except lane 5 (never);
    # tile 1 all conv at iter 2 (trips 3)
    conv = np.full(256, 2, np.int64)
    ok = np.ones(256, bool)
    ok[5] = False
    m = two_phase_trip_model(conv, ok, phase1=6, max_iterations=12)
    # single: tile0 runs 12 (straggler), tile1 runs 3
    assert m["single"] == (12 + 3) / 2
    # phase 1: tile0 capped at 6, tile1 exits at 3
    assert m["phase1_mean"] == (6 + 3) / 2
    # phase 2: one refeed lane -> one group of trips 12, amortized over 2
    assert m["phase2_per_tile"] == 12 / 2
    assert m["refeed_frac"] == 1 / 256
    assert m["refeed_tile_frac"] == 1 / 2


def test_all_counts_nonnegative(qc):
    for variant in ("spa", "minsum", "normalized_minsum", "offset_minsum"):
        for schedule in ("flooding", "layered"):
            c = decode_census(qc, variant, schedule)
            assert all(v >= 0 for v in c.counts.values())
            assert c.total() > 0


def test_mix_schedule_preserves_ratios():
    """The attainable-ceiling microkernel's op schedule (round 5) must
    keep the census class ratios under largest-remainder integerization."""
    from ldpc_tpu.analysis.roofline import _mix_schedule

    mix = {"fma": 51558.0, "roll": 6240.0, "where": 7297.0,
           "tanh": 3648.0, "log": 3648.0, "div": 3648.0,
           "sqrt": 0.0, "cossin": 0.0, "prng": 0.0}
    sched = _mix_schedule(mix, 64)
    assert len(sched) == 64
    from collections import Counter

    c = Counter(sched)
    total = sum(v for v in mix.values() if v > 0)
    for cls, n in c.items():
        assert abs(n - 64 * mix[cls] / total) <= 1.0, (cls, n)
    assert "sqrt" not in c and "cossin" not in c
    # every minority class appears in the first pass (round-robin head),
    # so no chain starts with a pure-fma prefix
    assert set(sched[:6]) == set(c)


def test_decode_census_grouped_costs_more_per_frame():
    """sublane_groups > 1 must price the grouped roll/syndrome overhead:
    per-frame element-ops strictly increase, driven by roll/where."""
    from ldpc_tpu.analysis.roofline import decode_census
    from ldpc_tpu.sim.runner import load_code

    qc = load_code("builtin:CCSDS_ldpc_n32_k16.alist.txt").qc
    c1 = decode_census(qc, "spa", "layered", check_every=2)
    c2 = decode_census(qc, "spa", "layered", check_every=2,
                       sublane_groups=2)
    assert c2.total() > c1.total()
    assert c2.counts["roll"] > c1.counts["roll"]
    assert c2.counts["where"] > c1.counts["where"]
    # elementwise arithmetic (check updates) is G-invariant per frame
    assert c2.counts["tanh"] == c1.counts["tanh"]
