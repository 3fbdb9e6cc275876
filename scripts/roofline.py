"""Roofline / speed-of-light report for the fused Monte-Carlo kernel.

Measures (on the live TPU):
  1. per-class VPU throughput via Pallas microkernels
     (ldpc_tpu.analysis.roofline.measure_vpu_rates),
  2. the bench operating point's mean per-tile decode iterations (the fused
     kernel iterates each 128-lane tile until ALL its codewords pass the
     syndrome check, so the work unit is the tile, not the codeword),
  3. achieved full-pipeline throughput (bench.py methodology),

then reports achieved info bits/s as a fraction of the analytic VPU-bound
ceiling. Writes examples/roofline/{roofline.json,README.md}; bench.py picks
the committed ceiling up and adds "pct_of_ceiling" to its stderr line.

Usage (TPU):  python scripts/roofline.py [--out examples/roofline]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax


def probe_point(code, opts, snr_db: float, *, batches: int = 8):
    """Measured per-tile trip statistics at the operating point (moved to
    ldpc_tpu.analysis.roofline.measure_tile_trips so scripts/perf_matrix.py
    can share it; kept here as a thin alias)."""
    from ldpc_tpu.analysis.roofline import measure_tile_trips

    return measure_tile_trips(code, opts, snr_db, batches=batches)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="builtin:wimax_1152_0.5.alist.txt")
    ap.add_argument("--snr", type=float, default=2.0)
    ap.add_argument("--iterations", type=int, default=12)
    ap.add_argument("--schedule", default="layered")
    ap.add_argument("--layer-order", default="paired",
                    help="bench.py's production config (round 4)")
    ap.add_argument("--check-every", type=int, default=2,
                    help="bench.py's production config (round 4)")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--bench-batches", type=int, default=320)
    ap.add_argument("--out", default="examples/roofline")
    args = ap.parse_args()

    from ldpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import re

    from bench import measure_point
    from ldpc_tpu.analysis.roofline import (
        CLASSES,
        measure_vpu_rates,
        speed_of_light,
        speed_of_light_two_phase,
        vpu_peak_ops_per_s,
    )
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor, load_code, resolve_two_phase

    code = load_code(args.code)
    opts = SimOptions(
        matrix=args.code, blocks=args.batch, iterations=args.iterations,
        ber=True, fer=True, fidelity="exact", batch=args.batch, seed=0,
        speed=code.k / code.n, schedule=args.schedule,
        layer_order=args.layer_order, check_every=args.check_every,
    )

    dev = jax.devices()[0].device_kind
    print(f"# device={dev} code={code.name}", flush=True)

    print("# measuring VPU per-class rates (Pallas microkernels)...",
          flush=True)
    rates = measure_vpu_rates(verbose=True)
    for c in CLASSES:
        print(f"#   {c:7s} {rates[c] / 1e9:8.2f} G elem-ops/s", flush=True)

    print("# measuring per-tile trip statistics...", flush=True)
    tile_iters, trip_model = probe_point(code, opts, args.snr)
    print(f"#   mean tile iters = {tile_iters:.3f} (max {args.iterations}; "
          f"trip-model cross-check {trip_model['single']:.3f})", flush=True)
    print(f"#   trip model: {trip_model}", flush=True)

    peak = vpu_peak_ops_per_s(dev)
    sol_kw = dict(
        k=code.k, variant=opts.decoder_variant, schedule=args.schedule,
        mode=opts.mode, track_norm=opts.normalized_llr, peak_ops_per_s=peak,
        check_every=args.check_every,
    )
    sol1 = speed_of_light(
        code.qc, rates, mean_tile_iters=tile_iters, **sol_kw
    )
    phase1 = resolve_two_phase(opts.two_phase, opts.iterations,
                               opts.check_every)
    sol2 = speed_of_light_two_phase(
        code.qc, rates, phase1=phase1 or opts.iterations // 2,
        trip_model=trip_model, **sol_kw,
    )

    print("# measuring achieved throughput (bench methodology)...", flush=True)
    executor = PointExecutor(code, opts)
    _, windows, fer, bits_per_s = measure_point(
        executor, code, args.snr, batch=args.batch,
        n_batches=args.bench_batches, n_windows=3,
    )
    # the ceiling must price the dispatch mode the executor ACTUALLY ran
    # (under two_phase='auto' the per-point probe decides; kernel_used
    # records it -- '+2phase(auto:N)' = split ran, '(auto:off)' = declined)
    used_two_phase = bool(
        re.search(r"\+2phase\((?:auto:)?\d+\)", executor.kernel_used)
    )
    sol = sol2 if used_two_phase else sol1
    frac = bits_per_s / sol["ceiling_info_bits_per_s"]
    sustained_ops = bits_per_s / code.k * sol["frame_ops"]

    report = {
        "device": dev,
        "code": code.name,
        "snr_db": args.snr,
        "schedule": args.schedule,
        "iterations": args.iterations,
        "kernel": executor.kernel_used,
        "two_phase_ceiling": used_two_phase,
        "layer_order": args.layer_order,
        "check_every": args.check_every,
        "vpu_peak_ops_per_s": peak,
        "vpu_measured_floor_gops": {c: rates[c] / 1e9 for c in CLASSES},
        "mean_tile_iters": tile_iters,
        "trip_model": trip_model,
        "fer": fer,
        "per_iter_ops": sol["per_iter_ops"],
        "frame_ops": sol["frame_ops"],
        "t_frame_us": sol["t_frame_s"] * 1e6,
        "ceiling_info_bits_per_s": sol["ceiling_info_bits_per_s"],
        "floor_info_bits_per_s": sol["floor_info_bits_per_s"],
        "achieved_info_bits_per_s": bits_per_s,
        "sustained_vpu_ops_per_s": sustained_ops,
        "fraction_of_ceiling": frac,
        # both bounds, for the record (the headline uses the matching one)
        "single_pass_ceiling_info_bits_per_s": sol1["ceiling_info_bits_per_s"],
        "two_phase_ceiling_info_bits_per_s": sol2["ceiling_info_bits_per_s"],
        "two_phase_t_mem_us": sol2["t_mem_s"] * 1e6,
        "two_phase_t_compute_us": sol2["t_compute_s"] * 1e6,
    }
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "roofline.json").write_text(json.dumps(report, indent=1))

    per_iter_tot = sum(sol["per_iter_ops"].values())
    print(
        f"\nkernel: {executor.kernel_used}\n"
        f"single-pass ceiling: {sol1['ceiling_info_bits_per_s'] / 1e9:.3f} G "
        f"info bits/s ({per_iter_tot:,.0f} elem-ops/iter x {tile_iters:.2f} "
        f"iters at the {peak / 1e12:.2f} T op/s VPU issue peak)\n"
        f"two-phase ceiling:   {sol2['ceiling_info_bits_per_s'] / 1e9:.3f} G "
        f"(phase trips {trip_model['phase1_mean']:.2f} + "
        f"{trip_model['phase2_per_tile']:.2f}; "
        f"t_mem {sol2['t_mem_s'] * 1e9:.0f} ns vs t_compute "
        f"{sol2['t_compute_s'] * 1e9:.0f} ns)\n"
        f"achieved: {bits_per_s / 1e9:.3f} G info bits/s = "
        f"{100 * frac:.1f}% of the {'two-phase' if used_two_phase else 'single-pass'} "
        f"speed-of-light (sustained {sustained_ops / 1e12:.2f} T "
        f"census-ops/s; measured-floor bound "
        f"{sol['floor_info_bits_per_s'] / 1e9:.3f} G)",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
