"""North-star config #4: large custom LDPC (n >= 4096) end-to-end.

BASELINE.json configs[3] -- "Large custom LDPC (n>=4096) with interleaver
chain + adaptive SNR-point early stopping" -- had never been exercised
(round-4 VERDICT, missing #2): the largest code ever run was n=2304, and
the fused kernel's VMEM story (E scratch ~ n) had never met a code that
stresses it. This study generates rate-1/2 girth->=6 QC codes on the
802.16e base graph at Z=192 (n=4608) and Z=384 (n=9216)
(models/generate.wimax_like, generalizing the reference's four shipped
``wimaxlike_*_set0`` files, Channel_Codes_Database/Custom LDPC Codes/),
writes their ALIST files, and runs the full chain:

1. **Load-time GF(2) elimination** (SURVEY section 7 hard part) timed: the
   packed-uint64 rref + generator build + G*H^T=0 validation.
2. **VMEM plan** for every kernel configuration at both sizes: which
   fused variants fit the 14 MB budget, and what the runner falls back to
   when they do not (n=9216 exceeds every plan -> XLA layered decoder).
   Round-5 capacity levers (layered llr-aliases-L, int8 w/mask blocks)
   are what admit the fused f32 SPA kernel at n=4608 at all.
3. **Throughput** at a waterfall operating point + census %SoL (n=4608
   fused; n=9216 XLA fallback, reported honestly).
4. **Waterfall curves** with per-point early stop (--target-errors, the
   "adaptive SNR-point early stopping" of the config).
5. **Interleaver chain**: the same sweep through the S-random
   interleaver chain (interleave -> channel -> deinterleave; the
   reference no-ops SRANDOM, data_buffer.py:508-519) -- runs the unfused
   pipeline, FER statistically identical on AWGN (PARITY.md: i.i.d.
   noise commutes with any permutation).

Writes examples/big_code/{results.json,README.md,*.alist.txt,curve JSONs}.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/big_code_study.py
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax

SNR_GRID = {
    192: (1.0, 2.2, 0.2),
    384: (0.9, 1.9, 0.2),
}


def vmem_plan(qc) -> dict:
    from ldpc_tpu.ops.mc_pallas import mc_vmem_bytes
    from ldpc_tpu.ops.spa_pallas import VMEM_BUDGET, qc_vmem_bytes

    plan = {}
    for sched in ("layered", "flooding"):
        for store in ("f32", "int8"):
            for emit in (False, True):
                b = mc_vmem_bytes(qc, sched, track_norm=False,
                                  emit_llr=emit, msg_store=store)
                plan[f"fused/{sched}/{store}/emit={emit}"] = {
                    "bytes": b, "fits": b <= VMEM_BUDGET}
        b = qc_vmem_bytes(qc, sched, track_norm=False)
        plan[f"qc-standalone/{sched}/f32"] = {
            "bytes": b, "fits": b <= VMEM_BUDGET}
    return plan


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/big_code")
    ap.add_argument("--zs", default="192,384")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--target-errors", type=int, default=150)
    ap.add_argument("--max-blocks", type=int, default=2_000_000)
    ap.add_argument("--n-windows", type=int, default=5)
    ap.add_argument("--n-batches", type=int, default=64)
    ap.add_argument("--skip-interleaver", action="store_true")
    args = ap.parse_args()

    from ldpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from bench import measure_point
    from ldpc_tpu.analysis.roofline import (
        measure_tile_trips,
        speed_of_light,
        speed_of_light_two_phase,
        vpu_peak_ops_per_s,
    )
    from ldpc_tpu.models.code import LDPCCode
    from ldpc_tpu.models.generate import wimax_like, write_alist
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import (
        PointExecutor,
        load_code,
        run_simulation,
    )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    dev = jax.devices()[0].device_kind
    results: dict = {"device": dev, "codes": {}}
    prev = out / "results.json"
    if prev.is_file():
        results = json.loads(prev.read_text())

    for Z in (int(z) for z in args.zs.split(",")):
        name = f"wimax_like_n{24 * Z}_z{Z}"
        alist_path = out / f"{name}.alist.txt"
        t0 = time.perf_counter()
        al = wimax_like(Z, seed=5)
        t_gen = time.perf_counter() - t0
        if not alist_path.is_file():
            write_alist(al, str(alist_path))
        t0 = time.perf_counter()
        code = load_code(str(alist_path))
        t_load = time.perf_counter() - t0
        entry = {
            "n": code.n, "k": code.k, "rate": code.rate, "Z": Z,
            "gen_s": t_gen,
            "load_rref_G_validate_s": t_load,
            "vmem_plan": vmem_plan(code.qc),
        }
        print(f"# {name}: n={code.n} k={code.k} "
              f"load(rref+G+validate)={t_load:.1f}s", flush=True)

        # ---- throughput at a waterfall point, production dispatch ----
        from ldpc_tpu.ops.mc_pallas import mc_kernel_fits
        from ldpc_tpu.ops.spa_pallas import qc_kernel_fits

        lo, hi, step = SNR_GRID[Z]
        # the XLA-fallback decoder (everything at n=9216) runs ~2 orders
        # below the fused kernel: cap its per-point frames so the sweep
        # stays minutes, not hours (FER resolution ~1e-4 there is enough
        # to show the waterfall; the fused n=4608 sweep keeps full depth)
        max_blocks = args.max_blocks
        snr_perf = (lo + hi) / 2
        perf_pallas = mc_kernel_fits(
            code.qc, "layered", track_norm=False
        ) or qc_kernel_fits(code.qc, "layered", track_norm=False)
        if not perf_pallas:
            max_blocks = min(max_blocks, 120_000)
        opts = SimOptions(
            matrix=str(alist_path), blocks=args.batch, iterations=12,
            ber=True, fer=True, fidelity="exact", batch=args.batch, seed=0,
            speed=code.k / code.n, schedule="layered", layer_order="paired",
            check_every=2 if perf_pallas else 1, two_phase="auto",
            quiet=True,
        )
        ex = PointExecutor(code, opts)
        med, windows, fer, bits = measure_point(
            ex, code, snr_perf, batch=args.batch,
            n_batches=max(args.n_batches, ex._max_chunk_steps),
            n_windows=args.n_windows,
            warmup_batches=max(args.n_batches, ex._max_chunk_steps),
            warmup_runs=1,
        )
        entry["perf"] = {
            "snr_db": snr_perf, "kernel": ex.kernel_used, "fer": fer,
            "info_bits_per_s": bits, "window_times_s": windows,
        }
        print(f"#   perf @ {snr_perf} dB: {bits / 1e9:.2f} G bits/s "
              f"kernel={ex.kernel_used} FER={fer:.2e}", flush=True)

        # census ceiling for whichever dispatch actually ran (bench.py's
        # matching rule); only meaningful on the fused path
        if "pallas+fused" in ex.kernel_used:
            import re

            tile_iters, trip_model = measure_tile_trips(
                code, opts, snr_perf, batches=4)
            kw = dict(k=code.k, variant="spa", schedule="layered", mode=1,
                      track_norm=False, check_every=2,
                      peak_ops_per_s=vpu_peak_ops_per_s(dev))
            if re.search(r"\+2phase\((?:auto:)?\d+\)", ex.kernel_used):
                sol = speed_of_light_two_phase(
                    code.qc, phase1=6, trip_model=trip_model, **kw)
            else:
                sol = speed_of_light(
                    code.qc, mean_tile_iters=tile_iters, **kw)
            entry["ceiling_info_bits_per_s"] = sol["ceiling_info_bits_per_s"]
            entry["pct_of_ceiling"] = round(
                100 * bits / sol["ceiling_info_bits_per_s"], 1)
            print(f"#   ceiling {sol['ceiling_info_bits_per_s'] / 1e9:.2f} G"
                  f" -> {entry['pct_of_ceiling']}% of light", flush=True)

        # ---- waterfall with per-point early stop ----
        for il in (["none"] if args.skip_interleaver else ["none", "srandom"]):
            # the interleaver chain forces the unfused pipeline; when the
            # standalone QC kernel's VMEM plan also overflows (n=4608:
            # 21.4M f32 > 14M), decode falls back to the XLA path, where
            # the Pallas-loop knobs (check_every, and for n=9216
            # everything fused) do not apply -- adapt them to whichever
            # path engages, exactly as a user following the error
            # messages would
            from ldpc_tpu.ops.mc_pallas import mc_kernel_fits
            from ldpc_tpu.ops.spa_pallas import qc_kernel_fits

            fused_ok = il == "none" and mc_kernel_fits(
                code.qc, "layered", track_norm=False)
            pallas_ok = fused_ok or qc_kernel_fits(
                code.qc, "layered", track_norm=False)
            il_blocks = max_blocks if pallas_ok else min(max_blocks, 120_000)
            sweep_opts = SimOptions(
                matrix=str(alist_path), blocks=il_blocks,
                iterations=12, ber=True, fer=True, fidelity="exact",
                batch=args.batch, seed=1, speed=code.k / code.n,
                schedule="layered", layer_order="paired",
                check_every=2 if pallas_ok else 1,
                two_phase="auto", quiet=True, interleaver=il,
                target_errors=args.target_errors,
                initial_snr=lo, end_snr=hi, step_snr=step,
                output_json=str(out / f"curve_{name}_{il}.json"),
            )
            t0 = time.perf_counter()
            res = run_simulation(sweep_opts, code=code)
            res.to_json(str(out / f"curve_{name}_{il}.json"))
            entry[f"curve_{il}"] = {
                "points": [
                    {"snr_db": p.snr_db, "fer": p.fer, "ber": p.ber,
                     "blocks": p.total_blocks}
                    for p in res.snr_points
                ],
                "wall_s": time.perf_counter() - t0,
            }
            for p in res.snr_points:
                print(f"#   [{il}] {p.snr_db:.2f} dB FER {p.fer:.3e} "
                      f"({p.total_blocks} blocks)", flush=True)

        results["codes"][name] = entry
        (out / "results.json").write_text(json.dumps(results, indent=1))
    print(f"# wrote {out}/results.json", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
