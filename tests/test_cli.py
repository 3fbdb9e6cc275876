"""CLI flag surface: parse -> SimOptions wiring, defaults, early stop."""

from __future__ import annotations

import jax
import pytest

from ldpc_tpu.cli import build_parser, options_from_args
from ldpc_tpu.sim.config import SimOptions


def _opts(argv):
    return options_from_args(build_parser().parse_args(argv))


def test_defaults_match_reference():
    o = _opts(["--matrix", "m.alist.txt"])
    assert (o.blocks, o.iterations, o.speed) == (100, 5, 1.0)
    assert (o.initial_snr, o.end_snr, o.step_snr) == (0.0, 5.0, 0.5)
    assert o.interleaver == "none" and o.decoder == "sumproduct"
    assert o.mode == 1 and o.modulation == 1 and o.encoding_method == "standard"
    assert not (o.ber or o.fer or o.normalized_llr or o.adaptive)
    assert o.fidelity == "reference" and o.schedule == "flooding"
    assert o.target_errors == 0


def test_every_flag_reaches_simoptions():
    o = _opts([
        "--matrix", "x", "--blocks", "7", "--iterations", "3",
        "--interleaver", "srandom", "--decoder", "minsum", "--speed", "0.5",
        "--initial-snr", "1", "--end-snr", "2", "--step-snr", "0.25",
        "--interference-snr", "3", "--mode", "2", "--p", "0.2",
        "--modulation", "2", "--s-param", "4", "--ber", "--fer",
        "--normalized-llr", "--encoding-method", "richardson-urbanke",
        "--ru-gap", "2", "--threads", "4", "--output-json", "a.json",
        "--output-csv", "a.csv", "--adaptive", "--matrix-dir", "d",
        "--adaptive-high-ber", "0.1", "--adaptive-low-ber", "1e-6",
        "--fidelity", "exact", "--decode-graph", "orig",
        "--check-rule", "exact", "--noise-model", "exact",
        "--batch", "64", "--seed", "5", "--exact-ber",
        "--kernel", "xla", "--schedule", "layered",
        "--minsum-alpha", "0.8", "--minsum-beta", "0.1",
        "--checkpoint", "ck.json", "--resume", "--profile", "tr",
        "--target-errors", "50", "--quiet",
    ])
    assert o.blocks == 7 and o.iterations == 3
    assert o.interleaver == "srandom" and o.decoder_variant == "minsum"
    assert o.speed == 0.5 and o.mode == 2 and o.p == 0.2 and o.modulation == 2
    assert o.s_param == 4 and o.ru_gap == 2 and o.threads == 4
    assert o.encoding_method == "richardson-urbanke"
    assert o.adaptive and o.matrix_dir == "d"
    assert o.adaptive_high_ber == 0.1 and o.adaptive_low_ber == 1e-6
    assert o.fidelity == "exact" and o.decode_graph == "orig"
    assert o.batch == 64 and o.seed == 5 and o.exact_ber
    assert o.kernel == "xla" and o.schedule == "layered"
    assert o.minsum_alpha == 0.8 and o.minsum_beta == 0.1
    assert o.checkpoint == "ck.json" and o.resume and o.profile == "tr"
    assert o.target_errors == 50 and o.quiet
    assert o.output_json == "a.json" and o.output_csv == "a.csv"


def test_target_errors_stops_early():
    from ldpc_tpu.sim.runner import PointExecutor, load_code

    code = load_code("builtin:wimax_576_0.5.alist.txt")
    opts = SimOptions(
        matrix=code.name, blocks=4096, iterations=5, ber=True, fer=True,
        fidelity="exact", batch=128, seed=0, target_errors=20, quiet=True,
        speed=0.5,
    )
    ex = PointExecutor(code, opts)
    # 1.5 dB is deep waterfall: every batch of 128 yields many frame errors
    stats = ex.run_point(1.5, 4096, jax.random.key(0), 0)
    assert stats.fer_frames >= 20
    assert stats.blocks < 4096  # stopped well before the full block budget

    # and with the target off, the full budget runs
    opts_off = SimOptions(
        matrix=code.name, blocks=512, iterations=5, ber=True, fer=True,
        fidelity="exact", batch=128, seed=0, quiet=True, speed=0.5,
    )
    ex2 = PointExecutor(code, opts_off)
    stats2 = ex2.run_point(1.5, 512, jax.random.key(0), 0)
    assert stats2.blocks == 512


def test_parse_mesh_axes():
    from ldpc_tpu.cli import _parse_mesh_axes

    assert _parse_mesh_axes("snr=2,batch=-1") == {"snr": 2, "batch": -1}
    assert _parse_mesh_axes("batch=8") == {"batch": 8}
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="bad --mesh"):
        _parse_mesh_axes("snr=two")
