"""Sublane-fill study: throughput vs sublane_groups G for small-lift codes.

VERDICT round-4 item 1: the committed perf matrix's %SoL column exposes a
30x utilization spread -- every code with lift Z < ~24 runs at 1-12% of its
census ceiling (CCSDS n32 Z=4: 1.2%, n128 Z=16: 5.7%, ITU G.h Z=14: 10.6%,
WRAN Z=16: 11.5%) while the Z=96 WiMAX codes run at 22-36%. The structural
cause: the kernel's sublane dimension IS Z (ops.spa_pallas), so a Z=4 code
issues [4, 128] vector ops that fill half of one (8, 128) vreg and whose
ALU latency cannot be amortized across vregs.

The lever: ``sublane_groups=G`` stacks G independent 128-codeword groups
into the sublane dimension ([G*Z, 128] ops, bit-identical per-codeword
counters -- tests/test_sublane_groups.py). This script measures the G sweep
on real hardware at each code's committed perf-matrix operating point,
under the production dispatch (layered-12 SPA, paired order, check_every=2,
probe-gated two-phase), with PAIRED interleaved windows (bench.
measure_paired): every round times all G values back-to-back, so cross-G
ratios are immune to the tunnel's drift and stall tail.

Writes examples/sublane_fill/{results.json,README.md}.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/sublane_fill.py
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

import jax

# (builtin name, committed matrix operating point Eb/N0, lift Z)
CODES = [
    ("CCSDS_ldpc_n32_k16.alist.txt", 5.65),   # Z=4
    ("CCSDS_ldpc_n128_k64.alist.txt", 4.1),   # Z=16
    ("LDPC_N336_K196_ITU_G.h.alist.txt", 2.7),  # Z=14
    ("WRAN_N384_K192_P16_R05.txt", 2.75),     # Z=16
    # threshold validation: Z just below / above the auto rule's Z<32 gate
    ("wifi_648_r083.alist.txt", 4.2),         # Z=27
    ("wigig_R05_N672_K336.alist.txt", 2.3),   # Z=42
]


def g_candidates(Z: int, fits) -> list[int]:
    """Powers of two up to the first G with G*Z > 256 (explore past the
    128-sublane auto cap to locate the optimum), VMEM-gated."""
    gs = [1]
    g = 2
    while g * Z <= 256:
        if fits(g):
            gs.append(g)
        g *= 2
    return gs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/sublane_fill")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--n-batches", type=int, default=64)
    ap.add_argument("--n-rounds", type=int, default=5)
    ap.add_argument("--codes", default=None)
    args = ap.parse_args()

    from ldpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from bench import measure_paired, paired_ratio
    from ldpc_tpu.ops.mc_pallas import mc_kernel_fits
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor, load_code

    dev = jax.devices()[0].device_kind
    print(f"# device={dev}", flush=True)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    codes = CODES
    if args.codes:
        keep = set(args.codes.split(","))
        codes = [c for c in CODES if c[0] in keep]

    results: dict = {}
    prev = out / "results.json"
    if prev.is_file():
        results = json.loads(prev.read_text()).get("codes", {})

    for name, snr in codes:
        code = load_code(f"builtin:{name}")
        Z = code.qc.Z

        def fits(g):
            return mc_kernel_fits(code.qc, "layered", emit_llr=True,
                                  track_norm=False, sublane_groups=g)

        gs = g_candidates(Z, fits)
        print(f"# {name}: Z={Z}, measuring G={gs}", flush=True)

        configs = []
        for g in gs:
            opts = SimOptions(
                matrix=code.name, blocks=args.batch, iterations=12,
                ber=True, fer=True, fidelity="exact", batch=args.batch,
                seed=0, speed=code.k / code.n, schedule="layered",
                decoder="sum-product", layer_order="paired", check_every=2,
                two_phase="auto", quiet=True, sublane_groups=g,
            )
            configs.append((f"G{g}", PointExecutor(code, opts), snr))

        # window depth follows the code's chunk depth so the windows are
        # DEVICE-bound: the first campaign ran flat 64-batch windows (one
        # ~28 ms tunnel dispatch each), which masked the grouping effect
        # entirely -- at device-bound depth, n32 G=16 measures x1.38
        nb = max(args.n_batches, configs[0][1]._max_chunk_steps)
        times = measure_paired(
            configs, batch=args.batch, n_batches=nb,
            n_rounds=args.n_rounds,
        )
        frame_bits = nb * args.batch * code.k
        row = {"Z": Z, "snr_db": snr, "n": code.n, "k": code.k, "gs": {}}
        t1 = times["G1"]
        for g in gs:
            t = times[f"G{g}"]
            med = float(np.median(t))
            speedup, lo, hi = paired_ratio(t1, t)  # >1 means G beats G=1
            ex = configs[gs.index(g)][1]
            row["gs"][str(g)] = {
                "window_times_s": t,
                "median_s": med,
                "info_bits_per_s": frame_bits / med,
                "speedup_vs_g1": speedup,
                "speedup_mid_lo": lo,
                "speedup_mid_hi": hi,
                "kernel": ex.kernel_used,
            }
            print(
                f"{name:38s} G={g:<3d} {frame_bits / med / 1e9:6.3f} G bits/s "
                f"speedup x{speedup:.2f} [{lo:.2f}-{hi:.2f}] "
                f"kernel={ex.kernel_used}",
                flush=True,
            )
        best = max(gs, key=lambda g: row["gs"][str(g)]["speedup_vs_g1"])
        row["best_g"] = best
        results[name] = row
        (out / "results.json").write_text(json.dumps(
            {"device": dev, "batch": args.batch,
             "n_batches": args.n_batches, "n_rounds": args.n_rounds,
             "codes": results}, indent=1))
    print(f"# wrote {out}/results.json", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
