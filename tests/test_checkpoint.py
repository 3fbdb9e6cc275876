"""Checkpoint / resume of SNR sweeps (absent in the reference -- SURVEY.md S5.4).

Because per-point PRNG keys fold by point index, resuming from a truncated
checkpoint must reproduce an uninterrupted run EXACTLY.
"""

from __future__ import annotations

import json
import os

import pytest

from ldpc_tpu.sim.config import SimOptions
from ldpc_tpu.sim.results import SimulationResult
from ldpc_tpu.sim.runner import run_simulation, sweep_fingerprint


def _opts(tmp_path, **kw) -> SimOptions:
    base = dict(
        matrix="builtin:BCH_7_4_1_strip.alist.txt",
        blocks=64,
        iterations=5,
        ber=True,
        fer=True,
        initial_snr=0.0,
        end_snr=2.0,
        step_snr=1.0,
        fidelity="exact",
        batch=64,
        seed=3,
        quiet=True,
    )
    base.update(kw)
    return SimOptions(**base)


def _points(r: SimulationResult):
    return [(p.snr_db, p.ber, p.fer, p.total_blocks) for p in r.snr_points]


def test_checkpoint_written_every_point(tmp_path):
    ckpt = str(tmp_path / "ck.json")
    full = run_simulation(_opts(tmp_path, checkpoint=ckpt))
    assert os.path.exists(ckpt)
    saved = SimulationResult.from_json(ckpt)
    assert _points(saved) == _points(full)
    assert sweep_fingerprint(saved.config) == sweep_fingerprint(full.config)


def test_resume_reproduces_uninterrupted_run(tmp_path):
    ckpt = str(tmp_path / "ck.json")
    full = run_simulation(_opts(tmp_path, checkpoint=ckpt))

    # simulate an interruption: keep only the first point
    saved = json.load(open(ckpt))
    saved["snr_points"] = saved["snr_points"][:1]
    json.dump(saved, open(ckpt, "w"))

    resumed = run_simulation(_opts(tmp_path, checkpoint=ckpt, resume=True))
    assert _points(resumed) == _points(full)


def test_resume_rejects_foreign_checkpoint(tmp_path, capsys):
    ckpt = str(tmp_path / "ck.json")
    run_simulation(_opts(tmp_path, checkpoint=ckpt))
    # different seed -> different sweep identity -> fresh start
    r = run_simulation(_opts(tmp_path, checkpoint=ckpt, resume=True, seed=4,
                             quiet=False))
    out = capsys.readouterr().out
    assert "different sweep" in out
    assert len(r.snr_points) == 3


def test_adaptive_resume_replays_state(tmp_path):
    from ldpc_tpu.models.catalog import MatrixCatalog
    from ldpc_tpu.sim.adaptive import AdaptiveController, ThresholdStrategy

    ckpt = str(tmp_path / "ck.json")
    opts = _opts(
        tmp_path,
        matrix="builtin:wimax_576_0.5.alist.txt",
        blocks=32,
        batch=32,
        initial_snr=0.0,
        end_snr=2.0,
        step_snr=1.0,
        adaptive=True,
        checkpoint=ckpt,
    )
    catalog = MatrixCatalog(None)

    full = AdaptiveController(ThresholdStrategy(), catalog).run_adaptive_sweep(opts)
    assert full.adaptation_log  # at 0 dB the interleaver rule must fire

    saved = json.load(open(ckpt))
    saved["snr_points"] = saved["snr_points"][:1]
    saved["adaptation_log"] = saved["adaptation_log"][:1]
    json.dump(saved, open(ckpt, "w"))

    resumed = AdaptiveController(ThresholdStrategy(), catalog).run_adaptive_sweep(
        SimOptions(**{**opts.__dict__, "resume": True})
    )
    assert _points(resumed) == _points(full)
    assert resumed.adaptation_log == full.adaptation_log


def test_fingerprint_sensitive_to_new_knobs(tmp_path):
    """shorten/puncture/schedule/s_param/exact_ber must change the sweep
    identity (a checkpoint from a different effective rate must not resume)."""
    ckpt = str(tmp_path / "ck.json")
    run_simulation(_opts(tmp_path, matrix="builtin:wimax_576_0.5.alist.txt",
                         batch=32, blocks=32, checkpoint=ckpt))
    r = run_simulation(_opts(tmp_path, matrix="builtin:wimax_576_0.5.alist.txt",
                             batch=32, blocks=32, checkpoint=ckpt, resume=True,
                             shorten=48))
    # fresh start -> all 3 points recomputed at the shortened rate
    assert len(r.snr_points) == 3
    saved = SimulationResult.from_json(ckpt)
    assert saved.config.shorten == 48


def test_adaptive_and_plain_checkpoints_incompatible(tmp_path):
    """An adaptive run's checkpoint must not resume a plain sweep (points
    were decoded with adaptation-modified parameters)."""
    from ldpc_tpu.models.catalog import MatrixCatalog
    from ldpc_tpu.sim.adaptive import AdaptiveController, ThresholdStrategy

    ckpt = str(tmp_path / "ck.json")
    opts = _opts(tmp_path, matrix="builtin:wimax_576_0.5.alist.txt",
                 blocks=32, batch=32, adaptive=True, checkpoint=ckpt)
    AdaptiveController(ThresholdStrategy(), MatrixCatalog(None)).run_adaptive_sweep(opts)

    plain = run_simulation(_opts(tmp_path, matrix="builtin:wimax_576_0.5.alist.txt",
                                 blocks=32, batch=32, checkpoint=ckpt,
                                 resume=True, quiet=False))
    # fresh start (fingerprint differs by the adaptive flag) -> 3 new points
    assert len(plain.snr_points) == 3


def test_parallel_sweep_checkpoint_resume(tmp_path):
    """The parallel sweep checkpoints raw per-point counters per dispatch;
    resuming mid-stream is bit-identical to the uninterrupted run (PRNG keys
    fold by (point, batch) index)."""
    from ldpc_tpu.sim.runner import run_simulation_parallel

    ckpt = str(tmp_path / "pk.json")
    opts = _opts(tmp_path, matrix="builtin:wimax_576_0.5.alist.txt",
                 blocks=96, batch=32)
    full = run_simulation_parallel(opts)

    # run with checkpointing; capture the mid-stream state after dispatch 1
    # by truncating: rerun 1 batch only via blocks=32, then resume to 96
    partial = SimOptions(**{**opts.__dict__, "blocks": 32, "checkpoint": ckpt})
    run_simulation_parallel(partial)
    assert os.path.exists(ckpt)
    saved = json.load(open(ckpt))
    assert saved["parallel_sweep"] == 1 and saved["batch_idx"] == 1

    # resume with the full block budget: fingerprint differs (blocks is part
    # of the sweep identity), so patch the saved fingerprint the way a real
    # interrupted 96-block run would have written it
    resumed_opts = SimOptions(
        **{**opts.__dict__, "checkpoint": ckpt, "resume": True}
    )
    from ldpc_tpu.sim.runner import make_sim_config, sweep_fingerprint, load_code

    fp = json.loads(json.dumps(sweep_fingerprint(
        make_sim_config(resumed_opts.resolved(), load_code(opts.matrix))
    )))
    saved["fingerprint"] = fp
    saved["remaining"] = 96 - 32
    json.dump(saved, open(ckpt, "w"))

    resumed = run_simulation_parallel(resumed_opts)
    assert _points(resumed) == _points(full)


def test_parallel_checkpoint_rejects_foreign(tmp_path, capsys):
    from ldpc_tpu.sim.runner import run_simulation_parallel

    ckpt = str(tmp_path / "pk.json")
    opts = _opts(tmp_path, matrix="builtin:wimax_576_0.5.alist.txt",
                 blocks=32, batch=32, checkpoint=ckpt)
    run_simulation_parallel(opts)
    r = run_simulation_parallel(
        SimOptions(**{**opts.__dict__, "resume": True, "seed": 9,
                      "quiet": False})
    )
    assert "different sweep" in capsys.readouterr().out
    assert all(p.total_blocks == 32 for p in r.snr_points)


def test_snr_steps_validation_and_dedup():
    from ldpc_tpu.sim.runner import snr_steps

    assert snr_steps(0.0, 0.2, 0.1) == [0.0, 0.1, 0.2]  # no duplicate end
    assert snr_steps(1.0, 1.0, 0.5) == [1.0]
    with pytest.raises(ValueError, match="positive"):
        snr_steps(0.0, 1.0, 0.0)
    with pytest.raises(ValueError, match=">= initial"):
        snr_steps(2.0, 1.0, 0.5)


def test_checkpoint_write_is_atomic(tmp_path):
    """to_json writes via temp+rename; no .tmp residue, valid JSON."""
    ckpt = str(tmp_path / "ck.json")
    run_simulation(_opts(tmp_path, checkpoint=ckpt))
    assert os.path.exists(ckpt)
    assert not os.path.exists(ckpt + ".tmp")
    SimulationResult.from_json(ckpt)  # parses
