"""Plot smoke tests (mirrors the reference's tests/test_visualization.py)."""

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pytest

from ldpc_tpu.sim.visualization import SimulationPlotter


@pytest.fixture
def plotter(sample_simulation_result):
    return SimulationPlotter(sample_simulation_result)


def test_ber_plot(plotter):
    ax = plotter.plot_ber_vs_snr()
    assert ax is not None
    plt.close("all")


def test_fer_plot(plotter):
    ax = plotter.plot_fer_vs_snr()
    assert ax is not None
    plt.close("all")


def test_llr_plot(plotter):
    ax = plotter.plot_llr_vs_snr()
    assert ax is not None
    plt.close("all")


def test_convergence_plot(plotter):
    ax = plotter.plot_convergence_vs_snr()
    assert ax is not None
    plt.close("all")


def test_dashboard_written(plotter, tmp_path):
    fig = plotter.plot_combined_dashboard(save_dir=str(tmp_path))
    assert fig is not None
    assert os.path.exists(tmp_path / "dashboard.png")
    plt.close("all")


def test_comparison(sample_simulation_result, tmp_path):
    out = str(tmp_path / "cmp.png")
    fig = SimulationPlotter.plot_comparison(
        [sample_simulation_result, sample_simulation_result], metric="ber", save_path=out
    )
    assert fig is not None and os.path.exists(out)
    plt.close("all")


def test_adaptation_history_empty_returns_none(plotter):
    assert plotter.plot_adaptation_history() is None


def test_adaptation_history_with_data(sample_simulation_result, tmp_path):
    sample_simulation_result.adaptation_log = [
        {"snr_db": 0.0, "rate": 0.5, "max_iterations": 5},
        {"snr_db": 1.0, "rate": 0.5, "max_iterations": 10},
    ]
    plotter = SimulationPlotter(sample_simulation_result)
    fig = plotter.plot_adaptation_history(save_dir=str(tmp_path))
    assert fig is not None
    assert os.path.exists(tmp_path / "adaptation_history.png")
    plt.close("all")


def test_zero_ber_filtered(sample_simulation_result):
    for p in sample_simulation_result.snr_points:
        p.ber = 0.0
    plotter = SimulationPlotter(sample_simulation_result)
    ax = plotter.plot_ber_vs_snr()
    assert ax is None  # nothing plottable on a log axis
    plt.close("all")
