"""ThresholdStrategy rules (mirrors the reference's tests/test_adaptive.py)."""

import pytest

from ldpc_tpu.sim.adaptive import (
    HIGHER_RATE,
    LOWER_RATE,
    AdaptiveState,
    ThresholdStrategy,
)
from ldpc_tpu.sim.results import SNRPointResult


def make_state(**kw):
    defaults = dict(
        current_matrix_path="m.alist.txt",
        current_rate=0.5,
        current_modulation=1,
        current_max_iterations=5,
        current_interleaver="none",
        current_encoding_method="standard",
    )
    defaults.update(kw)
    return AdaptiveState(**defaults)


def make_point(**kw):
    defaults = dict(
        snr_db=1.0,
        ber=1e-3,
        fer=0.1,
        avg_normalized_llr=0.0,
        total_blocks=100,
        successful_blocks=90,
        failed_blocks=10,
        avg_convergence_iterations=1.0,
    )
    defaults.update(kw)
    return SNRPointResult(**defaults)


@pytest.fixture
def strategy():
    return ThresholdStrategy(high_ber_threshold=1e-2, low_ber_threshold=1e-5)


def test_high_ber_switches_to_lower_rate(strategy):
    action = strategy.evaluate(make_state(), make_point(ber=5e-2))
    assert action is not None
    assert action.new_matrix_path == LOWER_RATE


def test_low_ber_switches_to_higher_rate(strategy):
    action = strategy.evaluate(make_state(), make_point(ber=1e-6))
    assert action is not None
    assert action.new_matrix_path == HIGHER_RATE


def test_zero_ber_does_not_switch(strategy):
    action = strategy.evaluate(make_state(), make_point(ber=0.0))
    assert action is None or action.new_matrix_path is None


def test_dead_zone_no_action(strategy):
    action = strategy.evaluate(make_state(), make_point(ber=1e-3, fer=0.1))
    assert action is None


def test_slow_convergence_doubles_iterations(strategy):
    action = strategy.evaluate(
        make_state(current_max_iterations=5),
        make_point(avg_convergence_iterations=4.5),
    )
    assert action is not None
    assert action.new_max_iterations == 10


def test_iterations_capped_at_100(strategy):
    action = strategy.evaluate(
        make_state(current_max_iterations=100),
        make_point(avg_convergence_iterations=99.0),
    )
    assert action is None or action.new_max_iterations is None


def test_high_fer_enables_interleaver(strategy):
    action = strategy.evaluate(make_state(), make_point(fer=0.8))
    assert action is not None
    assert action.new_interleaver == "random"


def test_no_double_interleaver(strategy):
    action = strategy.evaluate(
        make_state(current_interleaver="random"), make_point(fer=0.8)
    )
    assert action is None or action.new_interleaver is None


def test_reason_string(strategy):
    action = strategy.evaluate(make_state(), make_point(ber=5e-2, fer=0.9))
    assert "lower rate" in action.reason and "interleaver" in action.reason
