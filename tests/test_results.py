"""Results model: construction, dict shape, JSON/CSV round-trips.

Mirrors the reference's tests/test_results.py coverage."""

import csv
import json
import os

import pytest

from ldpc_tpu.sim.results import SimulationConfig, SimulationResult, SNRPointResult


def test_to_dict_shape(sample_simulation_result):
    d = sample_simulation_result.to_dict()
    assert isinstance(d["config"]["snr_range"], list)  # tuple -> list for JSON
    assert len(d["snr_points"]) == 3
    assert d["wall_clock_seconds"] == 12.5
    assert d["adaptation_log"] == []


def test_json_roundtrip(sample_simulation_result, tmp_path):
    path = str(tmp_path / "r.json")
    sample_simulation_result.to_json(path)
    loaded = SimulationResult.from_json(path)
    assert loaded.config.matrix_path == sample_simulation_result.config.matrix_path
    assert loaded.config.snr_range == sample_simulation_result.config.snr_range
    assert len(loaded.snr_points) == 3
    for a, b in zip(loaded.snr_points, sample_simulation_result.snr_points):
        assert a.snr_db == pytest.approx(b.snr_db)
        assert a.ber == pytest.approx(b.ber)
        assert a.fer == pytest.approx(b.fer)
    assert loaded.wall_clock_seconds == pytest.approx(12.5)


def test_csv_export(sample_simulation_result, tmp_path):
    path = str(tmp_path / "r.csv")
    sample_simulation_result.to_csv(path)
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    # reference column set (results.py:86-92)
    assert set(rows[0].keys()) == {
        "snr_db", "ber", "fer", "avg_normalized_llr", "total_blocks",
        "successful_blocks", "failed_blocks", "avg_convergence_iterations",
        "matrix_path", "modulation", "max_iterations", "interleaver",
        "encoding_method",
    }
    assert float(rows[0]["snr_db"]) == 0.0


def test_empty_result_csv(tmp_path, sample_simulation_result):
    empty = SimulationResult(
        config=sample_simulation_result.config, snr_points=[], wall_clock_seconds=0.0
    )
    path = str(tmp_path / "e.csv")
    empty.to_csv(path)
    assert not os.path.exists(path)  # reference: no file for empty results


def test_from_json_tolerates_reference_files(tmp_path):
    """A file with only the reference's config keys must load (our extra
    fields default)."""
    d = {
        "config": {
            "matrix_path": "m.alist.txt", "n": 7, "m": 3, "k": 4, "rate": 4 / 7,
            "blocks": 10, "max_iterations": 5, "encoding_method": "standard",
            "interleaver_type": "none", "decoder_type": "sumproduct",
            "channel_mode": 1, "modulation": 1, "speed": 1.0,
            "snr_range": [0.0, 2.0, 1.0], "threads": 1,
            "timestamp": "t", "interference_snr": 0.0, "p": 0.1,
        },
        "snr_points": [
            {
                "snr_db": 0.0, "ber": 0.1, "fer": 0.5, "avg_normalized_llr": 0.0,
                "total_blocks": 10, "successful_blocks": 5, "failed_blocks": 5,
                "avg_convergence_iterations": 1.0,
            }
        ],
        "wall_clock_seconds": 1.0,
    }
    path = str(tmp_path / "ref.json")
    with open(path, "w") as f:
        json.dump(d, f)
    loaded = SimulationResult.from_json(path)
    assert loaded.config.fidelity == "reference"  # defaulted extension field
    assert loaded.snr_points[0].matrix_path == ""  # defaulted point field


def test_adaptation_log_roundtrip(sample_simulation_result, tmp_path):
    sample_simulation_result.adaptation_log = [
        {"snr_db": 0.0, "rate": 0.5, "max_iterations": 5}
    ]
    path = str(tmp_path / "a.json")
    sample_simulation_result.to_json(path)
    loaded = SimulationResult.from_json(path)
    assert loaded.adaptation_log == sample_simulation_result.adaptation_log
