"""Tanner-graph statistics (ldpc_tpu.analysis.graph_stats)."""

from __future__ import annotations

import numpy as np

from ldpc_tpu.analysis.graph_stats import degree_histograms, girth, graph_stats
from ldpc_tpu.sim.runner import load_code


def _has_4_cycle(H: np.ndarray) -> bool:
    """Independent 4-cycle criterion: two columns sharing >= 2 rows."""
    H = np.asarray(H, np.int64)
    gram = H.T @ H
    np.fill_diagonal(gram, 0)
    return bool((gram >= 2).any())


def test_known_girths():
    # Tanner (155, 64): girth 8 is the construction's defining property
    tanner = load_code("builtin:Tanner_155_64.alist.txt")
    assert girth(tanner.H.to_dense()) == 8

    # 802.16e QC codes: the base-graph lift gives girth 6
    wimax = load_code("builtin:wimax_576_0.5.alist.txt")
    assert girth(wimax.H.to_dense()) == 6


def test_girth_matches_4cycle_criterion():
    for name in ("builtin:wimax_576_0.5.alist.txt",
                 "builtin:Tanner_155_64.alist.txt"):
        H = load_code(name).H.to_dense()
        assert (girth(H) == 4) == _has_4_cycle(H)


def test_girth_handles_trees_and_tiny_cycles():
    # 4-cycle: two checks sharing two variables
    H4 = np.array([[1, 1, 0], [1, 1, 1]])
    assert girth(H4) == 4
    # tree: a single check
    assert girth(np.array([[1, 1, 1]])) is None


def test_cli_graph_stats(capsys):
    import json

    from ldpc_tpu.cli import main as cli_main

    rc = cli_main(["--matrix", "builtin:Tanner_155_64.alist.txt",
                   "--graph-stats", "--fidelity", "exact"])
    assert rc == 0
    s = json.loads(capsys.readouterr().out)
    assert s["girth"] == 8 and s["n"] == 155 and s["graph"] == "orig"


def test_graph_stats_summary():
    code = load_code("builtin:wimax_576_0.5.alist.txt")
    s = graph_stats(code)
    assert s["n"] == 576 and s["k"] == 288 and s["girth"] == 6
    var, chk = degree_histograms(code.H.to_dense())
    assert s["variable_degrees"] == var and s["check_degrees"] == chk
    assert sum(d * c for d, c in var.items()) == s["edges"]
    assert sum(d * c for d, c in chk.items()) == s["edges"]
    assert abs(s["mean_check_degree"] - s["edges"] / s["m"]) < 1e-12
    # the std graph is much denser (reference decodes on it in 'reference'
    # fidelity) and generally has 4-cycles
    s_std = graph_stats(code, graph="std")
    assert s_std["edges"] > s["edges"]
