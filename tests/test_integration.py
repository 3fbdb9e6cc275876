"""End-to-end simulation tests (mirrors the reference's tests/test_integration.py
coverage, plus BER-physics checks the reference lacks)."""

import math
import os

import numpy as np
import pytest

from ldpc_tpu.sim.config import SimOptions
from ldpc_tpu.sim.results import SimulationResult
from ldpc_tpu.sim.runner import load_code, run_simulation

pytestmark = pytest.mark.integration


@pytest.fixture(scope="module")
def bch_result(bch_matrix_path):
    opts = SimOptions(
        matrix=bch_matrix_path,
        blocks=50,
        iterations=10,
        ber=True,
        fer=True,
        normalized_llr=True,
        initial_snr=0.0,
        end_snr=2.0,
        step_snr=1.0,
        seed=123,
        quiet=True,
    )
    return run_simulation(opts)


def test_point_count_and_params(bch_result, bch_matrix_path):
    assert len(bch_result.snr_points) == 3
    assert bch_result.config.n == 7 and bch_result.config.k == 4
    assert bch_result.config.matrix_path == bch_matrix_path
    assert bch_result.wall_clock_seconds > 0


def test_block_accounting(bch_result):
    for p in bch_result.snr_points:
        assert p.total_blocks == 50
        assert p.successful_blocks + p.failed_blocks == p.total_blocks
        assert 0.0 <= p.ber <= 1.0
        assert 0.0 <= p.fer <= 1.0


def test_convergence_iteration_semantics(bch_result):
    for p in bch_result.snr_points:
        if p.successful_blocks:
            assert 0.0 <= p.avg_convergence_iterations < 10


def test_json_reload_roundtrip(bch_result, tmp_path):
    path = str(tmp_path / "res.json")
    bch_result.to_json(path)
    loaded = SimulationResult.from_json(path)
    assert len(loaded.snr_points) == len(bch_result.snr_points)
    for a, b in zip(loaded.snr_points, bch_result.snr_points):
        assert a.ber == pytest.approx(b.ber)
        assert a.fer == pytest.approx(b.fer)


def test_seed_determinism(bch_matrix_path):
    opts = SimOptions(
        matrix=bch_matrix_path, blocks=30, iterations=5, ber=True, fer=True,
        initial_snr=1.0, end_snr=1.0, step_snr=1.0, seed=7, quiet=True,
    )
    r1 = run_simulation(opts)
    r2 = run_simulation(opts)
    assert r1.snr_points[0].ber == r2.snr_points[0].ber
    assert r1.snr_points[0].fer == r2.snr_points[0].fer


def test_ber_decreases_with_snr(wimax_matrix_path):
    """Exact fidelity: waterfall behavior on the real wimax code."""
    opts = SimOptions(
        matrix=wimax_matrix_path, blocks=200, iterations=15, ber=True, fer=True,
        initial_snr=-4.0, end_snr=2.5, step_snr=6.5, fidelity="exact",
        exact_ber=True, seed=3, quiet=True, batch=200,
    )
    r = run_simulation(opts)
    low, high = r.snr_points[0], r.snr_points[-1]
    # -4 dB: sigma=1.12, well above the rate-1/2 threshold -> decoding fails;
    # +2.5 dB: past the waterfall -> decoding succeeds
    assert low.fer > 0.9
    assert high.fer < 0.05


def test_reference_fidelity_matches_shipped_artifact(wimax_matrix_path):
    """Compat mode must reproduce the reference's own shipped results.csv
    (FER 0.36, avg conv 1.125 at 2 dB with 5 iterations, legacy noise).
    Monte-Carlo tolerance: 50 blocks in the artifact, 400 here."""
    opts = SimOptions(
        matrix=wimax_matrix_path, blocks=400, iterations=5, ber=True, fer=True,
        initial_snr=2.0, end_snr=2.0, step_snr=1.0, fidelity="reference",
        interleaver="random", seed=11, quiet=True, batch=400,
    )
    r = run_simulation(opts)
    p = r.snr_points[0]
    # shipped artifact: FER=0.36 with 50 blocks => 95% CI ~ +-0.13
    assert abs(p.fer - 0.36) < 0.15
    assert abs(p.avg_convergence_iterations - 1.125) < 0.4


def test_snr_grid_clamps_to_end():
    from ldpc_tpu.sim.runner import snr_steps

    grid = snr_steps(0.0, 5.0, 2.0)
    assert grid == [0.0, 2.0, 4.0, 5.0]
    assert snr_steps(0.0, 5.0, 1.0) == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]


def test_ru_encoding_end_to_end(bch_matrix_path):
    opts = SimOptions(
        matrix=bch_matrix_path, blocks=30, iterations=5, ber=True, fer=True,
        encoding_method="richardson-urbanke", initial_snr=3.0, end_snr=3.0,
        step_snr=1.0, seed=5, quiet=True,
    )
    r = run_simulation(opts)
    assert r.snr_points[0].total_blocks == 30


def test_cli_smoke(bch_matrix_path, tmp_path):
    from ldpc_tpu.cli import main

    out_json = str(tmp_path / "o.json")
    out_csv = str(tmp_path / "o.csv")
    rc = main(
        [
            "--matrix", bch_matrix_path, "--blocks", "20", "--iterations", "5",
            "--ber", "--fer", "--initial-snr", "1", "--end-snr", "2",
            "--step-snr", "1", "--quiet", "--output-json", out_json,
            "--output-csv", out_csv, "--plot-save", str(tmp_path / "plots"),
        ]
    )
    assert rc == 0
    assert os.path.exists(out_json) and os.path.exists(out_csv)
    assert os.path.exists(tmp_path / "plots" / "dashboard.png")
    loaded = SimulationResult.from_json(out_json)
    assert len(loaded.snr_points) == 2


def test_adaptive_sweep_end_to_end(wimax_matrix_path, matrix_db):
    from ldpc_tpu.models.catalog import MatrixCatalog
    from ldpc_tpu.sim.adaptive import AdaptiveController, ThresholdStrategy

    opts = SimOptions(
        matrix=wimax_matrix_path, blocks=60, iterations=5, ber=True, fer=True,
        initial_snr=0.0, end_snr=2.0, step_snr=1.0, seed=1, quiet=True, batch=60,
    )
    controller = AdaptiveController(ThresholdStrategy(), MatrixCatalog(matrix_db))
    r = controller.run_adaptive_sweep(opts)
    assert len(r.snr_points) == 3
    assert len(r.adaptation_log) == 3
    # high FER at 0 dB must have enabled the random interleaver afterwards
    assert r.adaptation_log[1]["interleaver"] == "random"


def test_plot_cli(bch_matrix_path, tmp_path, sample_simulation_result):
    from ldpc_tpu.plot_cli import main as plot_main

    path = str(tmp_path / "r.json")
    sample_simulation_result.to_json(path)
    out = str(tmp_path / "ber.png")
    assert plot_main([path, "--metric", "ber", "--output", out, "--no-show"]) == 0
    assert os.path.exists(out)
    assert (
        plot_main([path, "--dashboard", "--output-dir", str(tmp_path), "--no-show"])
        == 0
    )
    assert os.path.exists(tmp_path / "dashboard.png")
