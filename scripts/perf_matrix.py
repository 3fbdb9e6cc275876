"""Committed throughput matrix: codes x rates x schedules x decoders.

VERDICT round-2 item 5: one bench point (wimax 1152 r1/2 @ 2 dB) does not
substantiate "matching-or-beating on perf" across the code family the
reference ships, so this script measures decoded info bits/s/chip for
  {576, 1152, 2304} x {rate 1/2, 5/6} x {flooding-20, layered-12}
  x {SPA, normalized min-sum (alpha 0.8125)}
at MATCHED operating points: each (code, rate) runs at the Eb/N0 where its
layered-12 SPA FER lands in [2e-3, 3e-2] (found by a coarse on-device probe,
then shared by all four decoder configs of that code so rows compare like
for like -- every config decodes the same channel realizations equally
hard). Flooding at 20 iterations vs layered at 12 is the established
quality-matched pair (layered reaches LOWER FER at these settings;
examples/decoder_variants).

Timing: bench.py's measure_point (median window). Writes
examples/perf_matrix/{results.json,README.md}.

Usage (TPU):  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_matrix.py
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax

CODES = [
    # (builtin name, probe start Eb/N0)
    ("wimax_576_0.5.alist.txt", 2.4),
    ("wimax_1152_0.5.alist.txt", 2.0),
    ("wimax_2304_0.5.alist.txt", 1.8),
    ("wimax_576_0.83.alist.txt", 4.2),
    ("wimax_1152_0.83.alist.txt", 3.8),
    ("wimax_2304_0.83.alist.txt", 3.6),
]

CONFIGS = [
    # (label, decoder, schedule, iterations, alpha)
    ("spa/layered-12", "sum-product", "layered", 12, 0.75),
    ("spa/flooding-20", "sum-product", "flooding", 20, 0.75),
    ("nms/layered-12", "normalized-minsum", "layered", 12, 0.8125),
    ("nms/flooding-20", "normalized-minsum", "flooding", 20, 0.8125),
]


def make_executor(code, decoder, schedule, iterations, alpha, batch):
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor

    opts = SimOptions(
        matrix=code.name, blocks=batch, iterations=iterations,
        ber=True, fer=True, fidelity="exact", batch=batch, seed=0,
        speed=code.k / code.n, schedule=schedule, decoder=decoder,
        minsum_alpha=alpha, quiet=True,
    )
    return PointExecutor(code, opts)


def probe_operating_point(code, snr0, batch) -> tuple[float, float]:
    """Eb/N0 with layered-12 SPA FER in [2e-3, 3e-2] (quarter-dB steps)."""
    ex = make_executor(code, "sum-product", "layered", 12, 0.75, batch)

    def fer_at(snr):
        s = ex.run_point(snr, batch * 8, jax.random.key(17), 0)
        return s.fer_frames / s.blocks

    snr = snr0
    for _ in range(12):
        f = fer_at(snr)
        print(f"#   probe {code.name} @ {snr:.2f} dB -> FER {f:.2e}",
              flush=True)
        if 2e-3 <= f <= 3e-2:
            return snr, f
        snr += 0.25 if f > 3e-2 else -0.25
    return snr, f  # give up adjusting; report what we have


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/perf_matrix")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--n-batches", type=int, default=64)
    ap.add_argument("--n-windows", type=int, default=3)
    args = ap.parse_args()

    from ldpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from bench import measure_point
    from ldpc_tpu.sim.runner import load_code

    dev = jax.devices()[0].device_kind
    print(f"# device={dev}", flush=True)

    rows = []
    for name, snr0 in CODES:
        code = load_code(f"builtin:{name}")
        snr, probe_fer = probe_operating_point(code, snr0, args.batch)
        for label, decoder, schedule, iters, alpha in CONFIGS:
            ex = make_executor(code, decoder, schedule, iters, alpha,
                               args.batch)
            med, _, fer, bits = measure_point(
                ex, code, snr, batch=args.batch, n_batches=args.n_batches,
                n_windows=args.n_windows, warmup_batches=args.n_batches,
                warmup_runs=1,
            )
            row = {
                "code": code.name, "n": code.n, "k": code.k,
                "rate": round(code.k / code.n, 4), "snr_db": snr,
                "config": label, "kernel": ex.kernel_used,
                "fer": fer, "info_bits_per_s": bits,
            }
            rows.append(row)
            print(
                f"{code.name:28s} {label:16s} @ {snr:.2f} dB "
                f"kernel={ex.kernel_used} FER={fer:.2e} "
                f"bits/s={bits:,.0f}",
                flush=True,
            )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "results.json").write_text(
        json.dumps({"device": dev, "rows": rows}, indent=1)
    )

    # README table
    lines = [
        "# Throughput matrix — decoded info bits/s/chip\n",
        f"Measured on {dev} by `scripts/perf_matrix.py` (bench.py's "
        "median-window methodology, full fused Monte-Carlo pipeline).\n",
        "Each code runs at the Eb/N0 where layered-12 SPA FER falls in "
        "[2e-3, 3e-2] — a true waterfall operating point, shared by all "
        "four decoder configs of that row so columns compare on identical "
        "channels. The reference decodes ~363 info bits/s (BASELINE.md).\n",
        "Windows here are 64 batches (vs the headline bench's 320), so "
        "per-window dispatch overhead depresses these numbers ~10-20% "
        "relative to `bench.py`'s flagship figure; treat the table as "
        "internally consistent rather than as 24 independent headline "
        "claims. Single cells can swing ±20% with the remote-TPU tunnel's "
        "dispatch variance.\n",
        "| code | Eb/N0 | " + " | ".join(c[0] for c in CONFIGS) + " |",
        "|---|---|" + "---|" * len(CONFIGS),
    ]
    by_code: dict[str, dict] = {}
    for r in rows:
        by_code.setdefault(r["code"], {"snr": r["snr_db"]})[r["config"]] = r
    for cname, d in by_code.items():
        cells = []
        for label, *_ in CONFIGS:
            r = d.get(label)
            cells.append(
                f"{r['info_bits_per_s'] / 1e9:.2f} G (FER {r['fer']:.0e})"
                if r else "—"
            )
        lines.append(f"| {cname} | {d['snr']:.2f} dB | " +
                     " | ".join(cells) + " |")
    (out / "README.md").write_text("\n".join(lines) + "\n")
    print(f"# wrote {out}/results.json and README.md", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
