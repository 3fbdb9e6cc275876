"""Headline benchmark: full Monte-Carlo pipeline throughput on WiMAX (1152, 576).

Measures sustained decoded info bits/s/chip of the complete simulation step
(bit generation -> systematic encode -> BPSK+AWGN channel -> SPA decode with
syndrome early termination -> metric counters) at Eb/N0 = 2 dB (speed=0.5:
SNR is per info bit, so the rate-1/2 code runs ~1 dB above threshold with
FER ~1e-2) with exact (physically calibrated) noise on the original sparse
Tanner graph -- a true waterfall operating point where the decoder works
hard: nearly every batch carries failing codewords, so iteration early-exit
cannot short-circuit the measurement.

Decode schedule: layered (serial-C) at 12 iterations -- it reaches a LOWER
FER than the reference's flooding schedule at 20 iterations (0.006 vs 0.011
measured at this operating point), so the comparison concedes nothing on
error-correction quality. On TPU the executor auto-selects the fully-fused
Monte-Carlo kernel (ldpc_tpu.ops.mc_pallas): channel noise from the
in-kernel PRNG, decode, and counters in ONE Pallas kernel.

Metrology: the remote-TPU tunnel shows 2x dispatch-throughput swings between
identical runs, so the bench times NW windows of NS steps each and reports
the MEDIAN window (min/median/max go to stderr); the JSON value is the
median-window throughput.

Baseline: the reference simulator processes ~363 info bits/s single-threaded
(300 codewords of k=288 in 237.7 s, python_ldpc_app/results.json); measured
on THIS machine it does 85 info bits/s with 8 worker processes (PARITY.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_INFO_BITS_PER_S = 363.0  # reference: 288*300/237.74 (BASELINE.md)


def measure_point(executor, code, snr_db, *, batch, n_batches, n_windows,
                  warmup_batches=64, warmup_runs=2, key=None):
    """Median-window throughput + FER at one SNR point.

    The single timing methodology shared by this benchmark and
    scripts/variant_perf.py: ``warmup_runs`` untimed run_point calls (compile
    + one-time tunnel costs), then ``n_windows`` timed windows of
    ``n_batches`` batches each, reporting the median window (the remote-TPU
    tunnel swings dispatch throughput ~2x between identical runs).

    Returns ``(median_s, sorted_window_times, fer, info_bits_per_s)``.
    """
    import jax

    if key is None:
        key = jax.random.key(0)
    for w in range(warmup_runs):
        executor.run_point(
            snr_db, batch * warmup_batches, jax.random.fold_in(key, 999 + w), w
        )
    codewords = n_batches * batch
    window_times, fer_frames = [], 0
    for w in range(n_windows):
        t0 = time.perf_counter()
        s = executor.run_point(snr_db, codewords, jax.random.fold_in(key, w), w)
        window_times.append(time.perf_counter() - t0)
        fer_frames += s.fer_frames
    window_times.sort()
    median = window_times[len(window_times) // 2]
    fer = fer_frames / (n_windows * codewords)
    return median, window_times, fer, codewords * code.k / median


def measure_paired(configs, *, batch, n_batches, n_rounds=5,
                   warmup_batches=None, key=None):
    """PAIRED A/B window timing: interleave every config's timed windows
    within one session (VERDICT round-4 item 6).

    ``configs``: list of ``(label, executor, snr_db)``. Each round times one
    window per config back-to-back, so a per-round ratio between two
    configs compares dispatches measured seconds apart -- immune to the
    remote-TPU tunnel's slow drift and to the 10-50x single-window stall
    tail (a stall hits ONE window of ONE config in ONE round; the median
    per-round ratio survives it). Unpaired designs (time all of A, then
    all of B) cannot distinguish a few-percent dispatch delta from drift.

    Returns ``{label: [t_round0, t_round1, ...]}`` in round order (NOT
    sorted -- pairing is positional).
    """
    import jax

    if key is None:
        key = jax.random.key(0)
    if warmup_batches is None:
        warmup_batches = n_batches
    for i, (label, ex, snr) in enumerate(configs):
        ex.run_point(snr, batch * warmup_batches,
                     jax.random.fold_in(key, 7000 + i), 0)
    times = {label: [] for label, _, _ in configs}
    for r in range(n_rounds):
        for i, (label, ex, snr) in enumerate(configs):
            t0 = time.perf_counter()
            ex.run_point(snr, batch * n_batches,
                         jax.random.fold_in(key, r * 97 + i), r)
            times[label].append(time.perf_counter() - t0)
    return times


def paired_ratio(times_a, times_b):
    """Median per-round ratio t_a/t_b with the middle-round spread.

    Returns ``(median, lo, hi)`` over per-round ratios (one outlier round
    dropped per side when >= 4 rounds)."""
    import numpy as np

    r = np.sort(np.asarray(times_a) / np.asarray(times_b))
    med = float(np.median(r))
    if len(r) >= 4:
        return med, float(r[1]), float(r[-2])
    return med, float(r[0]), float(r[-1])


def main() -> int:
    import jax

    from ldpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor
    from __graft_entry__ import _flagship_code

    code = _flagship_code()
    batch = 4096
    opts = SimOptions(
        matrix=code.path or code.name,
        blocks=batch,
        iterations=12,
        ber=True,
        fer=True,
        fidelity="exact",
        batch=batch,
        seed=0,
        speed=0.5,  # Eb/N0 axis: rate-1/2 waterfall at 2 dB
        schedule="layered",
        # round-4 MFU levers, measured +4.3% combined at this point
        # (examples/mfu_levers): disjoint-row pair steps + one syndrome
        # check per two sweeps. Both change MC statistics (FER at this
        # point 6.5e-3 vs 6.15e-3 serial -- same operating point within
        # MC noise); the committed roofline prices this exact config.
        layer_order="paired",
        check_every=2,
    )
    executor = PointExecutor(code, opts)

    # timed region: the PRODUCTION streaming path (run_point). Windows are
    # LONG (320 batches = 5 pipelined scan-of-64 dispatches) so the fixed
    # per-window costs -- one ~28 ms tunnel sync plus one packed-counter
    # fetch per dispatch group -- amortize below 5%; warmup + median
    # methodology in measure_point.
    n_timed, n_windows = 320, 5
    elapsed, window_times, fer, bits_per_s = measure_point(
        executor, code, 2.0, batch=batch, n_batches=n_timed,
        n_windows=n_windows,
    )
    codewords = n_timed * batch  # per window
    info_bits = codewords * code.k

    # speed-of-light context: the committed roofline ceiling for this exact
    # operating point (examples/roofline, scripts/roofline.py -- census ops
    # divided by the VPU issue peak; arithmetic in the README there). The
    # ceiling is only quoted when its dispatch mode matches the one this run
    # actually used: the two-phase op stream has its own (higher) bound, so
    # dividing a two-phase numerator by the single-pass ceiling would
    # overstate the fraction of light (round-3 verdict, weak #1).
    ceiling = None
    try:
        import os
        import re
        rj = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "examples", "roofline", "roofline.json")
        with open(rj) as f:
            roof = json.load(f)
        used_two_phase = bool(
            re.search(r"\+2phase\((?:auto:)?\d+\)", executor.kernel_used)
        )
        # ... and the decode-loop op stream must match too: the gated
        # syndrome cadence (check_every) changes ops/sweep, so a ceiling
        # priced at a different cadence is the wrong denominator.
        # (layer_order does not change the op count -- pairing only
        # reorders statements -- so it is not gated on.)
        if (roof.get("two_phase_ceiling", False) == used_two_phase
                and roof.get("check_every", 1) == opts.check_every):
            ceiling = roof["ceiling_info_bits_per_s"]
        else:
            print(
                f"# roofline.json prices kernel={roof.get('kernel')!r} but "
                f"this run used {executor.kernel_used!r}; omitting "
                "pct_of_vpu_ceiling (re-run scripts/roofline.py)",
                file=sys.stderr,
            )
    except (OSError, KeyError, ValueError):
        pass
    sol = (f" pct_of_vpu_ceiling={100 * bits_per_s / ceiling:.1f}%"
           if ceiling else "")

    # context to stderr (driver reads only the stdout JSON line)
    spread = [info_bits / t for t in (window_times[-1], elapsed, window_times[0])]
    print(
        f"# code={code.name} n={code.n} k={code.k} batch={batch} "
        f"kernel={executor.kernel_used} codewords/window={codewords} "
        f"median_window={elapsed:.3f}s cw/s={codewords / elapsed:,.0f} "
        f"bits/s min/med/max={spread[0]:,.0f}/{spread[1]:,.0f}/{spread[2]:,.0f} "
        f"FER@2dB={fer:.4f} device={jax.devices()[0].device_kind}{sol}",
        file=sys.stderr,
    )

    out = {
        "metric": "wimax_1152_576 full-pipeline decoded info bits/s/chip",
        "value": round(bits_per_s, 1),
        "unit": "info_bits/s",
        "vs_baseline": round(bits_per_s / BASELINE_INFO_BITS_PER_S, 1),
    }
    if ceiling:
        out["pct_of_vpu_ceiling"] = round(100 * bits_per_s / ceiling, 1)
    print(json.dumps(out))
    return 0


def main_with_retry() -> int:
    """One retry for transient remote-TPU runtime faults.

    The tunnel occasionally surfaces FAILED_PRECONDITION / INTERNAL errors
    unrelated to the program (observed in-session); a fresh attempt in the
    same process re-dispatches against a recovered backend. Only those
    transient runtime faults are retried -- deterministic failures (config
    errors, code bugs) propagate with their full traceback immediately."""
    import jax

    try:
        return main()
    except jax.errors.JaxRuntimeError as e:
        msg = str(e)
        if not any(s in msg for s in ("FAILED_PRECONDITION", "INTERNAL",
                                      "UNAVAILABLE", "DEADLINE_EXCEEDED")):
            raise
        print(f"# bench attempt 1 failed ({type(e).__name__}: {msg}); "
              "retrying once", file=sys.stderr)
        time.sleep(10)
        return main()


if __name__ == "__main__":
    sys.exit(main_with_retry())
