"""Two-phase dispatch envelope on the flagship: {off, forced, auto} x SNR.

Measures full-pipeline throughput of the three dispatch modes at operating
points spanning FER ~1 (0 dB, every frame re-decodes: the regime where a
fixed split is a pure loss) to the deep waterfall (3.5 dB, tiles exit early
on their own), answering VERDICT round-3 item 3: 'auto' must never lose to
'off' by more than its probe noise at ANY operating point.

Also calibrates the probe cost model: for each point the forced-split and
single-pass throughputs plus the measured trip-model terms
(runner.two_phase_trip_model on a probe batch) solve for the implied
dispatch overhead in per-tile trip equivalents --
    overhead = single * t_two/t_single - (phase1_mean + phase2_per_tile)
which is what PointExecutor.TWO_PHASE_OVERHEAD_TRIPS encodes.

Writes examples/two_phase_envelope/results.json.

Usage (TPU):  python scripts/two_phase_envelope.py
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np


def main() -> int:
    from ldpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from bench import measure_point
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import (
        PointExecutor,
        load_code,
        two_phase_trip_model,
    )

    code = load_code("builtin:wimax_1152_0.5.alist.txt")
    batch = 4096
    base = dict(
        matrix=code.name, blocks=batch, iterations=12, ber=True, fer=True,
        fidelity="exact", batch=batch, seed=0, speed=0.5, schedule="layered",
        # round-4 production config (bench.py): the envelope must validate
        # the auto gate for the dispatch the headline actually runs
        layer_order="paired", check_every=2,
    )
    execs = {
        tp: PointExecutor(code, SimOptions(two_phase=tp, **base))
        for tp in ("off", "6", "auto")
    }
    snrs = [0.0, 1.0, 2.0, 3.0, 3.5]
    n_batches, n_windows = 160, 3

    report = {
        "device": jax.devices()[0].device_kind,
        "code": code.name,
        "schedule": "layered",
        "iterations": 12,
        "batch": batch,
        "batches_per_window": n_batches,
        "windows": n_windows,
        "points": [],
    }
    for i, snr in enumerate(snrs):
        row = {"snr_db": snr}
        for tp, ex in execs.items():
            # fresh per-point probe for 'auto' (the cache carries across
            # measure_point's warmup, which is what production does too)
            med, wins, fer, bits = measure_point(
                ex, code, snr, batch=batch, n_batches=n_batches,
                n_windows=n_windows, key=jax.random.key(17 + i),
            )
            row[tp] = {
                "info_bits_per_s_med": bits,
                "info_bits_per_s_min": n_batches * batch * code.k / wins[-1],
                "info_bits_per_s_max": n_batches * batch * code.k / wins[0],
                "fer": fer,
                "kernel": ex.kernel_used,
            }
            print(f"snr={snr:g} two_phase={tp:4s} {bits/1e9:.3f} G bits/s "
                  f"FER={fer:.2e} kernel={ex.kernel_used}", flush=True)
        # trip-model terms from one probe batch (single-pass executor)
        ex = execs["off"]
        consts = ex._consts_cache[snr]
        block, _ = ex._step(jax.random.fold_in(jax.random.key(99), i), consts)
        m = two_phase_trip_model(
            np.asarray(block.conv_iter), np.asarray(block.ok), 6, 12
        )
        row["trip_model"] = m
        t_ratio = (row["off"]["info_bits_per_s_med"]
                   / row["6"]["info_bits_per_s_med"])
        row["implied_overhead_trips"] = (
            m["single"] * t_ratio - (m["phase1_mean"] + m["phase2_per_tile"])
        )
        row["auto_vs_off"] = (row["auto"]["info_bits_per_s_med"]
                              / row["off"]["info_bits_per_s_med"])
        row["forced_vs_off"] = (row["6"]["info_bits_per_s_med"]
                                / row["off"]["info_bits_per_s_med"])
        print(f"  model={m} implied_overhead={row['implied_overhead_trips']:.2f} "
              f"auto/off={row['auto_vs_off']:.3f} "
              f"forced/off={row['forced_vs_off']:.3f}", flush=True)
        report["points"].append(row)

    out = Path("examples/two_phase_envelope")
    out.mkdir(parents=True, exist_ok=True)
    (out / "results.json").write_text(json.dumps(report, indent=1))
    print(f"wrote {out}/results.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
