"""Paired A/B re-statement of the envelope's auto-vs-off rows (item 6).

Round-4 weak #6: at 3.5 dB the envelope measured auto at 0.952x off while
running the BYTE-IDENTICAL single-pass program -- the unpaired 3-window
design could not distinguish dispatch cost from tunnel drift, so "tunnel
variance" had to carry the explanation. This script re-states the
comparison with interleaved paired windows (bench.measure_paired): each
round times auto and off back-to-back, and the claim becomes a median
per-round ratio with a mid-round spread. Where auto declines the split it
runs the same compiled program as off, so the true ratio is 1.0 by
construction (minus the one probe batch per point, amortized over the
whole point) -- the paired design must show that.

Writes examples/two_phase_envelope/paired.json; the study README's
addendum reads from it.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/envelope_paired.py
"""

from __future__ import annotations

import json
from pathlib import Path

import jax


def main() -> int:
    from ldpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from bench import measure_paired, paired_ratio
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor, load_code

    code = load_code("builtin:wimax_1152_0.5.alist.txt")
    batch = 4096
    base = dict(
        matrix=code.name, blocks=batch, iterations=12, ber=True, fer=True,
        fidelity="exact", batch=batch, seed=0, speed=0.5,
        schedule="layered", layer_order="paired", check_every=2,
        quiet=True,
    )
    out = Path("examples/two_phase_envelope")
    report = {"device": jax.devices()[0].device_kind, "points": {}}

    for snr in (2.0, 3.0, 3.5):
        ex_off = PointExecutor(code, SimOptions(two_phase="off", **base))
        ex_auto = PointExecutor(code, SimOptions(two_phase="auto", **base))
        times = measure_paired(
            [("off", ex_off, snr), ("auto", ex_auto, snr)],
            batch=batch, n_batches=64, n_rounds=8,
        )
        ratio, lo, hi = paired_ratio(times["off"], times["auto"])
        report["points"][str(snr)] = {
            "auto_kernel": ex_auto.kernel_used,
            "times_off_s": times["off"],
            "times_auto_s": times["auto"],
            "auto_over_off": ratio,  # >1: auto faster
            "mid_lo": lo, "mid_hi": hi,
        }
        print(f"{snr:.1f} dB: auto/off = x{ratio:.3f} [{lo:.3f}-{hi:.3f}] "
              f"(auto={ex_auto.kernel_used})", flush=True)
    (out / "paired.json").write_text(json.dumps(report, indent=1))
    print(f"# wrote {out}/paired.json", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
