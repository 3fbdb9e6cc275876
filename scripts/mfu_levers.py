"""MFU levers on the flagship bench point (VERDICT round-3 item 2).

Measures, one lever at a time, the throughput deltas of:
  * --layer-order paired : disjoint-support base-row pairs per layered step
    (two independent dependence chains for the VPU's 4-wide ALUs;
    arithmetic-identical to a serial sweep in the flattened pair order --
    models.qc.paired_layer_groups, tests/test_paired.py)
  * --check-every 2      : one syndrome check per two sweeps (the check is
    ~14% of a layered iteration's ops; detection coarsens to 2-sweep
    windows)
  * both combined
against the shipped baseline (serial, per-sweep checks), all under the
production dispatch (two_phase='auto'). tile_b=256 is NOT re-measured: it
was measured ~5% slower in round 3 (spa_pallas.pick_tile_b docstring) and
nothing in these levers changes the per-tile VMEM story.

Methodology: bench.py's measure_point (median of --n-windows windows of
--n-batches batches; middle-window spread). FER is recorded per config --
paired reorders layers and ce=2 coarsens detection, so FER agreement is
statistical, not bit-exact (both are measured here at the same seeds).

Writes examples/mfu_levers/{results.json,README.md}.

Usage (TPU):  PYTHONPATH=/root/repo:/root/.axon_site python scripts/mfu_levers.py
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax

LEVERS = [
    # label, layer_order, check_every
    ("baseline", "serial", 1),
    ("paired", "paired", 1),
    ("ce2", "serial", 2),
    ("paired+ce2", "paired", 2),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="builtin:wimax_1152_0.5.alist.txt")
    ap.add_argument("--snr", type=float, default=2.0)
    ap.add_argument("--iterations", type=int, default=12)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--n-batches", type=int, default=64)
    ap.add_argument("--n-windows", type=int, default=5)
    ap.add_argument("--winner-batches", type=int, default=320,
                    help="re-measure the best lever at bench depth")
    ap.add_argument("--out", default="examples/mfu_levers")
    args = ap.parse_args()

    from ldpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from bench import measure_point
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor, load_code

    code = load_code(args.code)
    dev = jax.devices()[0].device_kind
    print(f"# device={dev} code={code.name} @ {args.snr:g} dB", flush=True)

    def make_ex(layer_order, check_every):
        opts = SimOptions(
            matrix=code.name, blocks=args.batch, iterations=args.iterations,
            ber=True, fer=True, fidelity="exact", batch=args.batch, seed=0,
            speed=code.k / code.n, schedule="layered", quiet=True,
            layer_order=layer_order, check_every=check_every,
        )
        return PointExecutor(code, opts)

    rows = []
    for label, lo, ce in LEVERS:
        ex = make_ex(lo, ce)
        med, windows, fer, bits = measure_point(
            ex, code, args.snr, batch=args.batch, n_batches=args.n_batches,
            n_windows=args.n_windows, warmup_batches=args.n_batches,
            warmup_runs=1,
        )
        frame_bits = args.n_batches * args.batch * code.k
        t = windows
        lo_t, hi_t = (t[-2], t[1]) if len(t) >= 4 else (t[-1], t[0])
        rows.append({
            "lever": label, "layer_order": lo, "check_every": ce,
            "kernel": ex.kernel_used, "fer": fer,
            "info_bits_per_s": bits,
            "info_bits_per_s_mid_lo": frame_bits / lo_t,
            "info_bits_per_s_mid_hi": frame_bits / hi_t,
            "window_times_s": windows,
        })
        base = rows[0]["info_bits_per_s"]
        print(f"{label:12s} kernel={ex.kernel_used} FER={fer:.2e} "
              f"bits/s={bits:,.0f} "
              f"[{rows[-1]['info_bits_per_s_mid_lo'] / 1e9:.2f}-"
              f"{rows[-1]['info_bits_per_s_mid_hi'] / 1e9:.2f} G] "
              f"x{bits / base:.3f} vs baseline", flush=True)

    best = max(rows, key=lambda r: r["info_bits_per_s"])
    print(f"# winner: {best['lever']}; re-measuring at bench depth "
          f"({args.winner_batches} batches)", flush=True)
    deep = {}
    for label in ("baseline", best["lever"]) if best["lever"] != "baseline" \
            else ("baseline",):
        r = next(x for x in rows if x["lever"] == label)
        ex = make_ex(r["layer_order"], r["check_every"])
        med, windows, fer, bits = measure_point(
            ex, code, args.snr, batch=args.batch,
            n_batches=args.winner_batches, n_windows=3,
            warmup_batches=64, warmup_runs=1,
        )
        deep[label] = {
            "info_bits_per_s": bits, "fer": fer,
            "window_times_s": windows, "kernel": ex.kernel_used,
        }
        print(f"# deep {label}: {bits:,.0f} bits/s FER={fer:.2e}",
              flush=True)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "results.json").write_text(json.dumps({
        "device": dev, "code": code.name, "snr_db": args.snr,
        "iterations": args.iterations, "batch": args.batch,
        "n_batches": args.n_batches, "n_windows": args.n_windows,
        "rows": rows, "deep": deep,
    }, indent=1))
    print(f"# wrote {out}/results.json", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
