"""Decode EVERY QC builtin through the Pallas kernel on real TPU hardware.

VERDICT r1: the flagship kernel was only proven on wimax 576 in interpret
mode; VMEM fit and on-hardware behavior across the whole database were open.
This sweep runs one Monte-Carlo batch per builtin code on the TPU -- fused
kernel where eligible (hardware PRNG), flooding schedule -- at an SNR chosen
so the decoder does real work, and records kernel kind, VMEM plan, FER and
convergence. A second pass covers the layered schedule for one code per
family (incl. the multi-diagonal CCSDS family).

Usage (from /root/repo, TPU attached):
    python scripts/family_tpu_validation.py [--out examples/family_tpu/RESULTS.md]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def run_code(name: str, schedule: str, blocks: int = 256, iters: int = 8):
    import jax

    from ldpc_tpu.ops.channel import ChannelParams
    from ldpc_tpu.ops.mc_pallas import mc_vmem_bytes
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor, load_code

    code = load_code(name)
    if code.qc is None:
        return None
    # Eb/N0 ~1 dB above a rate-dependent threshold proxy: high-rate codes
    # need more SNR to reach a working point; this only needs the decoder to
    # do non-trivial work, not a calibrated waterfall.
    snr = 1.5 + 4.0 * max(code.rate - 0.5, 0.0)
    opts = SimOptions(
        matrix=name, blocks=blocks, iterations=iters, ber=True, fer=True,
        fidelity="exact", batch=blocks, seed=0, schedule=schedule, quiet=True,
    )
    t0 = time.time()
    ex = PointExecutor(code, opts)
    stats = ex.run_point(snr, blocks, jax.random.key(1), 0)
    dt = time.time() - t0
    vmem = mc_vmem_bytes(code.qc, schedule) / (1 << 20)
    return {
        "name": name, "n": code.n, "k": code.k, "Z": code.qc.Z,
        "schedule": schedule, "kernel": ex.kernel_used,
        "vmem_mb": round(vmem, 1), "snr": snr,
        "fer": stats.fer_frames / max(stats.blocks, 1),
        "ok": stats.ok_blocks, "blocks": stats.blocks,
        "avg_conv": (stats.conv_iters_sum / stats.conv_count
                     if stats.conv_count else -1.0),
        "seconds": round(dt, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/family_tpu/RESULTS.md")
    ap.add_argument("--layered-all", action="store_true",
                    help="layered pass for every code (default: one per family)")
    args = ap.parse_args()

    import jax

    from ldpc_tpu.models.standards import builtin_names

    assert jax.default_backend() == "tpu", "run on the TPU host"
    dev = jax.devices()[0].device_kind

    names = builtin_names()
    rows = []
    t_start = time.time()
    for i, name in enumerate(names):
        try:
            r = run_code(name, "flooding")
        except Exception as e:  # record, keep sweeping
            rows.append({"name": name, "error": f"{type(e).__name__}: {e}"})
            print(f"[{i + 1}/{len(names)}] {name}: FAILED {e}", flush=True)
            continue
        if r is None:
            print(f"[{i + 1}/{len(names)}] {name}: not QC (XLA path)", flush=True)
            continue
        rows.append(r)
        print(
            f"[{i + 1}/{len(names)}] {name}: {r['kernel']} "
            f"vmem={r['vmem_mb']}MB fer={r['fer']:.3f} "
            f"ok={r['ok']}/{r['blocks']} {r['seconds']}s",
            flush=True,
        )

    # layered pass: every family representative (or all with --layered-all)
    layered_targets = [
        "wimax_2304_0.5.alist.txt", "wimax_576_0.5.alist.txt",
        "wimax_2304_0.83.alist.txt", "wifi_648_r083.alist.txt",
        "wigig_R05_N672_K336.alist.txt", "CCSDS_ldpc_n512_k256.alist.txt",
        "CCSDS_ldpc_n32_k16.alist.txt", "Tanner_155_64.alist.txt",
        "LDPC_N336_K196_ITU_G.h.alist.txt",
        "WRAN_N384_K192_P16_R05.txt",
    ]
    if args.layered_all:
        layered_targets = [r["name"] for r in rows if "error" not in r]
    lrows = []
    for name in layered_targets:
        try:
            r = run_code(name, "layered")
        except Exception as e:
            lrows.append({"name": name, "error": f"{type(e).__name__}: {e}"})
            print(f"[layered] {name}: FAILED {e}", flush=True)
            continue
        if r is None:
            continue
        lrows.append(r)
        print(
            f"[layered] {name}: {r['kernel']} fer={r['fer']:.3f} "
            f"ok={r['ok']}/{r['blocks']} {r['seconds']}s",
            flush=True,
        )

    total = time.time() - t_start
    import os

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(
            "# On-TPU Pallas validation across the whole builtin family\n\n"
            f"Device: {dev}. One {256}-codeword batch per code at a "
            "rate-adjusted waterfall-ish SNR, 8 iterations, `--fidelity "
            "exact`; kernel auto-selection (fused Monte-Carlo kernel where "
            "eligible). Generated by `scripts/family_tpu_validation.py` "
            f"in {total / 60:.1f} min.\n\n"
            "## Flooding schedule (all QC builtins)\n\n"
            "| code | n | k | Z | kernel | VMEM MB | SNR | FER | ok | avg conv | s |\n"
            "|---|---|---|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            if "error" in r:
                f.write(f"| {r['name']} | ERROR: {r['error']} |\n")
            else:
                f.write(
                    f"| {r['name']} | {r['n']} | {r['k']} | {r['Z']} "
                    f"| {r['kernel']} | {r['vmem_mb']} | {r['snr']:.1f} "
                    f"| {r['fer']:.4f} | {r['ok']}/{r['blocks']} "
                    f"| {r['avg_conv']:.1f} | {r['seconds']} |\n"
                )
        f.write(
            "\n## Layered schedule (family representatives, incl. "
            "multi-diagonal CCSDS)\n\n"
            "| code | n | Z | kernel | FER | ok | avg conv | s |\n"
            "|---|---|---|---|---|---|---|---|\n"
        )
        for r in lrows:
            if "error" in r:
                f.write(f"| {r['name']} | ERROR: {r['error']} |\n")
            else:
                f.write(
                    f"| {r['name']} | {r['n']} | {r['Z']} | {r['kernel']} "
                    f"| {r['fer']:.4f} | {r['ok']}/{r['blocks']} "
                    f"| {r['avg_conv']:.1f} | {r['seconds']} |\n"
                )
    n_err = sum(1 for r in rows + lrows if "error" in r)
    print(f"done: {len(rows)} flooding + {len(lrows)} layered rows, "
          f"{n_err} errors, {total / 60:.1f} min -> {args.out}")
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main())
