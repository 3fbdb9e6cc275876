"""Committed throughput matrix: codes x rates x schedules x decoders.

VERDICT round-2 item 5 established the matrix for the six WiMAX codes;
round-3 items 5+6 extend it:

* one row per code FAMILY the reference ships
  (Channel_Codes_Database/Standardized LDPC Codes/ + Custom): wifi_648,
  wigig_672, 802.11ad_672, CCSDS n128/n32, WRAN_N384, ITU G.h n336 --
  alongside the {576, 1152, 2304} x {r1/2, r5/6} WiMAX grid;
* every cell reports the median of 5 timed windows plus the
  middle-window spread (the remote-TPU tunnel stalls single windows
  10-50x; a single-run cell cannot support cross-cell claims);
* every row carries its census speed-of-light ceiling
  (ldpc_tpu.analysis.roofline) at the row's measured mean tile trips, and
  the spa/layered cell's % of it -- the "how fast is fast" column.

Operating points are MATCHED: each code runs at the Eb/N0 where its
layered-12 SPA FER lands in [2e-3, 3e-2] (coarse on-device probe, shared by
all four decoder configs of that row so columns compare like for like).
Flooding-20 vs layered-12 is the established quality-matched pair (layered
reaches LOWER FER at these settings; examples/decoder_variants).

Cells run the production dispatch (two_phase='auto'); the ceiling column is
priced for whichever dispatch the spa/layered cell actually used
(kernel_used), mirroring bench.py's mode-matching rule.

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
    # one row per non-WiMAX family in the reference database
    ("wifi_648_r083.alist.txt", 4.2),
    ("wigig_R05_N672_K336.alist.txt", 2.8),
    ("ieee_802_11ad_p42_n672_r081.alist.txt", 4.4),
    ("CCSDS_ldpc_n128_k64.alist.txt", 4.6),
    ("CCSDS_ldpc_n32_k16.alist.txt", 6.4),
    ("WRAN_N384_K192_P16_R05.txt", 3.0),
    ("LDPC_N336_K196_ITU_G.h.alist.txt", 3.2),
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
        # round-5: the PRODUCTION decode-loop dispatch bench.py runs
        # (round-4 VERDICT weak #1 -- the old matrix measured the stale
        # serial/per-sweep loop). Layered rows take the paired order +
        # gated cadence; flooding rows have no layers to pair but share
        # the ce2 cadence so columns compare the same syndrome economics.
        layer_order="paired" if schedule == "layered" else "serial",
        check_every=2,
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


def row_ceiling(code, opts, snr, kernel_used: str) -> dict | None:
    """Census speed-of-light for this row's spa/layered config, priced for
    the dispatch mode the cell actually ran (bench.py's matching rule)."""
    from ldpc_tpu.analysis.roofline import (
        measure_tile_trips,
        speed_of_light,
        speed_of_light_two_phase,
        vpu_peak_ops_per_s,
    )
    from ldpc_tpu.sim.runner import resolve_sublane_groups, resolve_two_phase

    if code.qc is None:
        return None
    tile_iters, trip_model = measure_tile_trips(
        code, opts, snr, batches=4
    )
    kw = dict(
        k=code.k, variant="spa", schedule="layered", mode=1,
        track_norm=False, check_every=opts.check_every,
        # the grouped layout's extra roll/select/reduce ops are part of
        # the executed stream the ceiling prices (auto G=2 at Z<8)
        sublane_groups=resolve_sublane_groups(code.qc, opts),
        peak_ops_per_s=vpu_peak_ops_per_s(jax.devices()[0].device_kind),
    )
    # '+2phase(auto:off)' means the probe DECLINED the split: the run was
    # single-pass and must get the single-pass ceiling (same regex as
    # bench.py's gate -- a bare substring test misprices declined cells)
    import re

    two_phase = bool(re.search(r"\+2phase\((?:auto:)?\d+\)", kernel_used))
    if two_phase:
        phase1 = resolve_two_phase(
            "auto", opts.iterations, opts.check_every
        ) or opts.iterations // 2
        sol = speed_of_light_two_phase(
            code.qc, phase1=phase1, trip_model=trip_model, **kw
        )
    else:
        sol = speed_of_light(code.qc, mean_tile_iters=tile_iters, **kw)
    return {
        "ceiling_info_bits_per_s": sol["ceiling_info_bits_per_s"],
        "two_phase": two_phase,
        "mean_tile_iters": tile_iters,
        "trip_model": trip_model,
    }


def _spread_lo(r: dict) -> float:
    """Row spread floor with fallbacks for resumed pre-round-4 rows (which
    lack both the mid-window and the min/max fields)."""
    return r.get("info_bits_per_s_mid_lo",
                 r.get("info_bits_per_s_min", r["info_bits_per_s"]))


def _spread_hi(r: dict) -> float:
    return r.get("info_bits_per_s_mid_hi",
                 r.get("info_bits_per_s_max", r["info_bits_per_s"]))


def write_readme(out: Path, dev: str, rows, ceilings,
                 n_windows: int, n_batches: int) -> None:
    """Regenerate README.md from results rows (also used by cell-repair
    one-offs: python -c "import json; from perf_matrix import write_readme; ...")."""
    # README table
    lines = [
        "# Throughput matrix — decoded info bits/s/chip\n",
        f"Measured on {dev} by `scripts/perf_matrix.py` (bench.py's "
        "median-window methodology, full fused Monte-Carlo pipeline, "
        "production dispatch = probe-gated two-phase).\n",
        "Each code runs at the Eb/N0 where layered-12 SPA FER falls in "
        "[2e-3, 3e-2] — a true waterfall operating point, shared by all "
        "four decoder configs of that row so columns compare on identical "
        "channels. One row per non-WiMAX family in the reference database. "
        "The reference decodes ~363 info bits/s (BASELINE.md).\n",
        f"Cells show the median of {n_windows} timed windows with the "
        "middle-window spread (one outlier window dropped per side: the "
        "remote-TPU tunnel stalls single windows 10-50x; absolute min/max "
        "are in results.json). Claims that compare cells should survive "
        "the spread, not just the medians. Windows are "
        f"max({n_batches}, the code's chunk depth) batches -- the depth "
        "scales inversely with per-batch device work "
        "(runner._max_chunk_steps) so every window amortizes the ~28 ms "
        "per-dispatch tunnel latency that depressed the round-4 matrix's "
        "small-code rows up to 6.7x "
        "(examples/sublane_fill/binder.json).\n",
        "`ceiling` is the row's census speed-of-light "
        "(`ldpc_tpu.analysis.roofline`) at the measured mean tile trips, "
        "priced for the dispatch the spa/layered cell ran; `%SoL` is that "
        "cell's fraction of it.\n",
        "Large-code rows whose chunk depth IS 64 (wimax_1152/2304) expose "
        "one ~28 ms dispatch latency per 64-batch window: ~0.1-0.4 G below "
        "`bench.py`'s 320-batch flagship figure (1.38 G here vs 1.77 G "
        "headline = the predicted ~24% at ~90 ms device work/window) -- a "
        "measurement-window effect, not a kernel difference.\n",
        "The matrix's tightest cross-cell claim (NMS >= SPA on the "
        "802.11ad row, whose spreads nearly touch) is re-stated with "
        "interleaved paired windows in `paired_11ad.json`: nms/spa = "
        "x1.071 with per-round spread [1.048-1.084] -- the ordering "
        "survives pairing (round-5 item 6).\n",
        "| code | n | rate | Eb/N0 | "
        + " | ".join(c[0] for c in CONFIGS)
        + " | ceiling | %SoL |",
        "|---|---|---|---|" + "---|" * (len(CONFIGS) + 2),
    ]
    by_code: dict[str, dict] = {}
    canon = [c[0] for c in CODES]
    for r in sorted(rows, key=lambda r: canon.index(r["code"])
                    if r["code"] in canon else len(canon)):
        by_code.setdefault(
            r["code"], {"snr": r["snr_db"], "n": r["n"], "rate": r["rate"]}
        )[r["config"]] = r
    for cname, d in by_code.items():
        cells = []
        for label, *_ in CONFIGS:
            r = d.get(label)
            cells.append(
                f"{r['info_bits_per_s'] / 1e9:.2f} G "
                f"[{_spread_lo(r) / 1e9:.2f}–{_spread_hi(r) / 1e9:.2f}] "
                f"(FER {r['fer']:.0e})"
                if r else "—"
            )
        ceil = ceilings.get(cname)
        cells.append(
            f"{ceil['ceiling_info_bits_per_s'] / 1e9:.2f} G" if ceil else "—"
        )
        cells.append(f"{ceil['pct_of_ceiling']}%" if ceil else "—")
        lines.append(
            f"| {cname} | {d['n']} | {d['rate']:g} | {d['snr']:.2f} dB | "
            + " | ".join(cells) + " |"
        )
    (out / "README.md").write_text("\n".join(lines) + "\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/perf_matrix")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--n-batches", type=int, default=64)
    ap.add_argument("--n-windows", type=int, default=5)
    ap.add_argument("--codes", default=None,
                    help="comma-separated subset of builtin names")
    args = ap.parse_args()

    from ldpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from bench import measure_point
    from ldpc_tpu.sim.runner import load_code

    dev = jax.devices()[0].device_kind
    print(f"# device={dev}", flush=True)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    codes = CODES
    if args.codes:
        keep = set(args.codes.split(","))
        codes = [c for c in CODES if c[0] in keep]

    # resume-friendly: keep committed rows for codes this invocation skips
    # (tunnel errors kill long runs; rerun with --codes for the remainder).
    # A code's OLD rows are only dropped at the moment its NEW rows land
    # (round-4 ADVICE: pre-filtering meant the first incremental flush
    # permanently lost the old rows of every not-yet-rerun code).
    rows: list[dict] = []
    ceilings: dict[str, dict] = {}
    prev = out / "results.json"
    if prev.is_file():
        old = json.loads(prev.read_text())
        rows = list(old.get("rows", []))
        ceilings = dict(old.get("ceilings", {}))
    for name, snr0 in codes:
        code = load_code(f"builtin:{name}")
        snr, probe_fer = probe_operating_point(code, snr0, args.batch)
        code_rows: list[dict] = []
        for label, decoder, schedule, iters, alpha in CONFIGS:
            ex = make_executor(code, decoder, schedule, iters, alpha,
                               args.batch)
            # window size scales with the executor's chunk depth so a
            # small code's window holds >= 1 full-depth dispatch group --
            # at the flat 64 a CCSDS-n32 window is one ~28 ms tunnel
            # round trip and measures the link, not the kernel
            # (examples/sublane_fill/binder.json)
            nb = max(args.n_batches, ex._max_chunk_steps)
            med, windows, fer, bits = measure_point(
                ex, code, snr, batch=args.batch, n_batches=nb,
                n_windows=args.n_windows, warmup_batches=nb,
                warmup_runs=1,
            )
            frame_bits = nb * args.batch * code.k
            # windows sorted ascending by time: fastest -> max bits/s. The
            # remote tunnel occasionally stalls one window ~10-50x (observed
            # repeatedly); absolute min/max land in JSON, the README spread
            # uses the middle windows (drop one outlier per side at >=4
            # windows) so cross-cell claims compare dispatch, not tunnel
            # hiccups.
            t = windows
            lo_t, hi_t = (t[-2], t[1]) if len(t) >= 4 else (t[-1], t[0])
            row = {
                "code": code.name, "n": code.n, "k": code.k,
                "rate": round(code.k / code.n, 4), "snr_db": snr,
                "config": label, "kernel": ex.kernel_used,
                "n_batches": nb,
                "fer": fer, "info_bits_per_s": bits,
                "info_bits_per_s_min": frame_bits / windows[-1],
                "info_bits_per_s_max": frame_bits / windows[0],
                "info_bits_per_s_mid_lo": frame_bits / lo_t,
                "info_bits_per_s_mid_hi": frame_bits / hi_t,
                "window_times_s": windows,
            }
            code_rows.append(row)
            print(
                f"{code.name:38s} {label:16s} @ {snr:.2f} dB "
                f"kernel={ex.kernel_used} FER={fer:.2e} "
                f"bits/s={bits:,.0f} "
                f"[{row['info_bits_per_s_mid_lo'] / 1e9:.2f}"
                f"-{row['info_bits_per_s_mid_hi'] / 1e9:.2f} G mid]",
                flush=True,
            )
            if label == "spa/layered-12":
                ceil = row_ceiling(code, ex.opts, snr, ex.kernel_used)
                if ceil is not None:
                    ceil["pct_of_ceiling"] = round(
                        100 * bits / ceil["ceiling_info_bits_per_s"], 1
                    )
                    ceilings[code.name] = ceil
                    print(
                        f"#   ceiling {ceil['ceiling_info_bits_per_s'] / 1e9:.2f} G "
                        f"({'2phase' if ceil['two_phase'] else 'single'}) "
                        f"-> {ceil['pct_of_ceiling']}% of light",
                        flush=True,
                    )
        # this code finished all configs: NOW replace its old rows
        rows = [r for r in rows if r["code"] != code.name] + code_rows
        # incremental flush so a killed run keeps finished rows
        (out / "results.json").write_text(json.dumps(
            {"device": dev, "n_windows": args.n_windows,
             "n_batches": args.n_batches, "batch": args.batch,
             "rows": rows, "ceilings": ceilings}, indent=1))

    write_readme(out, dev, rows, ceilings, args.n_windows,
                 args.n_batches)
    print(f"# wrote {out}/results.json and README.md", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
