"""Headline benchmark: full Monte-Carlo pipeline throughput on WiMAX (1152, 576).

Measures sustained decoded info bits/s/chip of the complete simulation step
(bit generation -> systematic encode -> BPSK+AWGN channel -> SPA decode with
syndrome early termination -> metric counters) at Eb/N0 = 2 dB (speed=0.5:
SNR is per info bit, so the rate-1/2 code runs ~1 dB above threshold with
FER ~1e-2) with exact (physically calibrated) noise on the original sparse
Tanner graph, max 20 iterations -- a true waterfall operating point where
the decoder works hard: nearly every batch carries failing codewords, so
iteration early-exit cannot short-circuit the measurement.

Decode schedule: layered (serial-C) at 12 iterations -- it reaches a LOWER
FER than the reference's flooding schedule at 20 iterations (0.006 vs 0.011
measured at this operating point), so the comparison concedes nothing on
error-correction quality.

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


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ldpc_tpu.ops.channel import ChannelParams
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
        schedule="layered",
    )
    executor = PointExecutor(code, opts)
    consts = ChannelParams(snr_db=2.0, speed=0.5, noise_model="exact").consts()
    key = jax.random.key(0)

    # compile + warmup: several full loops -- the first dispatches after
    # compilation pay one-time runtime/transfer costs (esp. via remote TPU
    # tunnels), so warm until per-step time stabilizes
    for w in range(5):
        for i in range(5):
            stats, _ = executor._step(jax.random.fold_in(key, 1000 * w + i), consts)
            counters = executor._reduce(stats, jnp.int32(batch))
        jax.block_until_ready(counters)

    # timed region: stream batches like the production sweep does; take the
    # median of several windows (remote-TPU tunnels show 2x throughput
    # swings between windows, so the median needs a wide sample)
    n_timed, n_windows = 20, 9
    window_times = []
    totals = None
    for w in range(n_windows):
        t0 = time.perf_counter()
        for i in range(n_timed):
            stats, _ = executor._step(jax.random.fold_in(key, 37 * w + i), consts)
            counters = executor._reduce(stats, jnp.int32(batch))
            totals = counters if totals is None else totals + counters
        jax.block_until_ready(totals)
        window_times.append(time.perf_counter() - t0)
    elapsed = sorted(window_times)[len(window_times) // 2]

    codewords = n_timed * batch  # per window
    info_bits = codewords * code.k
    bits_per_s = info_bits / elapsed

    # context to stderr (driver reads only the stdout JSON line)
    fer = float(totals.fer_frames) / (n_windows * codewords)
    print(
        f"# code={code.name} n={code.n} k={code.k} batch={batch} "
        f"codewords={codewords} elapsed={elapsed:.3f}s "
        f"cw/s={codewords / elapsed:,.0f} FER@2dB={fer:.4f} "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "wimax_1152_576 full-pipeline decoded info bits/s/chip",
                "value": round(bits_per_s, 1),
                "unit": "info_bits/s",
                "vs_baseline": round(bits_per_s / BASELINE_INFO_BITS_PER_S, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
