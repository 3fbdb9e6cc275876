"""Hardware parity check: two-phase fused dispatch vs single-pass, on TPU.

tests/test_two_phase.py proves the composition bit-identical in interpret
mode on CPU; this script closes the remaining gap (ADVICE round 3): phase 2
is a SEPARATELY COMPILED Pallas kernel, and compiled-program differences
(FMA contraction, reduction tiling) could in principle perturb results,
which would silently break the checkpoint fingerprint's two_phase exclusion
(sim.runner.sweep_fingerprint). Here the exact production dispatch runs on
the real chip, two-phase {explicit N, auto} vs off, same seeds, across
operating points from FER~1 to FER~1e-4 and across decoder variants, and
EVERY counter must match exactly.

The norm-LLR boundary: norm_llr_sum is an f32 device-side accumulator whose
rounding depends on the compiled program's reduction order. The round-4
first run of this script measured it diverging at ~1e-7 relative between
dispatch modes while every integer counter stayed exact across 3.7M
frames/case (parity_runs/tpu_two_phase_norm_evidence.json). The runner
therefore REFUSES the two-phase split when --normalized-llr is tracked;
this script asserts that enforcement too, so the green contract is total:
in every configuration two-phase dispatch can run in, all counters are
bit-exact.

Writes parity_runs/tpu_two_phase.json; exits nonzero on any violation.

Usage (TPU):  python scripts/tpu_two_phase_parity.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import jax


def counters(stats) -> dict:
    return {
        "blocks": stats.blocks,
        "ok_blocks": stats.ok_blocks,
        "error_bits": stats.error_bits,
        "fer_frames": stats.fer_frames,
        "norm_llr_sum": stats.norm_llr_sum,
        "conv_iters_sum": stats.conv_iters_sum,
        "conv_count": stats.conv_count,
    }


def main() -> int:
    from ldpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor, load_code

    assert jax.default_backend() == "tpu", "this parity check needs the TPU"

    cases = [
        # (code, schedule, decoder, iterations, snr points)
        ("builtin:wimax_1152_0.5.alist.txt", "layered", "sumproduct", 12,
         [0.0, 2.0, 2.5]),
        ("builtin:wimax_576_0.5.alist.txt", "flooding", "normalized-minsum",
         20, [1.0, 3.0]),
    ]
    blocks = 4096 * 8
    report = {"device": jax.devices()[0].device_kind, "blocks": blocks,
              "cases": []}
    failures = 0
    for matrix, schedule, variant, iters, snrs in cases:
        code = load_code(matrix)
        base = dict(
            matrix=matrix, blocks=blocks, iterations=iters, ber=True,
            fer=True, fidelity="exact", batch=4096,
            seed=7, speed=0.5, schedule=schedule, decoder=variant,
        )
        execs = {
            tp: PointExecutor(code, SimOptions(two_phase=tp, **base))
            for tp in ("off", str(iters // 2), "auto")
        }
        for snr in snrs:
            row = {"code": code.name, "schedule": schedule,
                   "variant": variant, "iterations": iters, "snr_db": snr}
            outs = {}
            for tp, ex in execs.items():
                s = ex.run_point(snr, blocks, jax.random.key(7), int(snr * 2))
                outs[tp] = counters(s)
                row[f"kernel[{tp}]"] = ex.kernel_used
            row["counters"] = outs["off"]
            row["match"] = all(outs[tp] == outs["off"] for tp in outs)
            if not row["match"]:
                failures += 1
                row["mismatch"] = {tp: outs[tp] for tp in outs
                                   if outs[tp] != outs["off"]}
            fer = outs["off"]["fer_frames"] / blocks
            print(f"{code.name} {schedule}/{variant} @ {snr:g} dB "
                  f"FER={fer:.2e}: "
                  f"{'MATCH' if row['match'] else 'MISMATCH'}", flush=True)
            report["cases"].append(row)

    # enforcement: the split must be refused when norm-LLR is tracked
    # (evidence: parity_runs/tpu_two_phase_norm_evidence.json)
    code = load_code("builtin:wimax_576_0.5.alist.txt")
    norm_opts = dict(
        matrix=code.name, blocks=4096, iterations=20, ber=True, fer=True,
        normalized_llr=True, fidelity="exact", batch=4096, seed=7,
        speed=0.5, schedule="flooding", decoder="normalized-minsum",
    )
    try:
        PointExecutor(code, SimOptions(two_phase="10", **norm_opts))
        report["norm_llr_explicit_raises"] = False
        failures += 1
    except ValueError:
        report["norm_llr_explicit_raises"] = True
    ex = PointExecutor(code, SimOptions(two_phase="auto", **norm_opts))
    report["norm_llr_auto_single_phase"] = "2phase" not in ex.kernel_used
    if not report["norm_llr_auto_single_phase"]:
        failures += 1
    print(f"norm-LLR gate: explicit raises={report['norm_llr_explicit_raises']}"
          f" auto single-phase={report['norm_llr_auto_single_phase']}",
          flush=True)

    report["all_match"] = failures == 0
    out = Path("parity_runs/tpu_two_phase.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print(f"wrote {out}; all_match={report['all_match']}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
