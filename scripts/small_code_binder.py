"""Diagnose the REAL small-code binder (round-5 item 1, diagnosis arm).

The sublane-fill G-sweep (examples/sublane_fill) falsified the round-4
hypothesis: stacking G codeword groups into the sublane dimension changes
CCSDS n32 throughput by at most +6% (G=16) while the census ceiling says
~50x is available -- so register underfill / ALU latency is NOT what binds
small codes. Back-of-envelope at the measured 0.12 G info bits/s: a
4096-codeword batch carries ~11 us of census VPU work at the flagship's
sustained rate but takes ~500 us on device -- ~490 us/batch of overhead
that per-tile grouping cannot touch.

This script isolates that overhead by direct experiment:

1. BATCH LADDER: throughput at batch in {4k, 16k, 64k, 256k} (fixed total
   codewords per window). If a per-batch fixed cost binds, throughput
   rises ~linearly with batch size until the fixed cost amortizes.
2. COMPONENT ISOLATION at the best batch: time the in-scan step with the
   decode kernel replaced by nothing (PRNG + encode + reduce only), and
   the kernel alone outside the scan -- attributing the per-batch cost to
   XLA-side step ops vs the pallas call itself.

Writes examples/sublane_fill/binder.json (consumed by the study README).

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/small_code_binder.py
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="CCSDS_ldpc_n32_k16.alist.txt")
    ap.add_argument("--snr", type=float, default=5.65)
    ap.add_argument("--out", default="examples/sublane_fill")
    ap.add_argument("--window-codewords", type=int, default=64 * 4096)
    ap.add_argument("--batches", default="4096,16384,65536,262144")
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    from ldpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from ldpc_tpu.ops.channel import ChannelParams
    from ldpc_tpu.ops.encode import make_encoder_T, random_info_bits
    from ldpc_tpu.ops.mc_pallas import consts_vector, make_mc_decoder
    from ldpc_tpu.ops.metrics import BlockCounters, reduce_block_stats, BlockStats
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor, load_code

    code = load_code(f"builtin:{args.code}")
    dev = jax.devices()[0].device_kind
    print(f"# device={dev} code={code.name} n={code.n} k={code.k} "
          f"Z={code.qc.Z}", flush=True)

    W = args.window_codewords
    batches = [int(b) for b in args.batches.split(",")]
    result = {"device": dev, "code": code.name, "snr_db": args.snr,
              "window_codewords": W, "ladder": {}}

    # ---- 1. batch ladder (production executor, single-pass dispatch) ----
    for batch in batches:
        opts = SimOptions(
            matrix=code.name, blocks=batch, iterations=12, ber=True,
            fer=True, fidelity="exact", batch=batch, seed=0,
            speed=code.k / code.n, schedule="layered", layer_order="paired",
            check_every=2, two_phase="off", quiet=True, sublane_groups=1,
        )
        ex = PointExecutor(code, opts)
        ex.run_point(args.snr, W, jax.random.key(99), 0)  # warmup
        times = []
        for r in range(args.rounds):
            t0 = time.perf_counter()
            ex.run_point(args.snr, W, jax.random.fold_in(jax.random.key(0), r), r)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        bits = W * code.k / med
        result["ladder"][str(batch)] = {
            "median_s": med, "info_bits_per_s": bits,
            "per_batch_ms": 1e3 * med / (W / batch),
            "times": times,
        }
        print(f"batch={batch:>7d}: {bits / 1e9:6.3f} G bits/s "
              f"({1e3 * med / (W / batch):6.2f} ms/batch, "
              f"{W // batch} steps/window)", flush=True)

    # ---- 2. component isolation at 4096 (the production batch) ----
    batch = 4096
    spec = code.standard_encode_spec
    info_pos = np.asarray(spec.info_pos("orig"), np.int32)
    encode_T = make_encoder_T(spec, "orig")
    consts = ChannelParams(mode=1, snr_db=args.snr, speed=code.k / code.n,
                           noise_model="exact").consts()
    cvec = consts_vector(consts)
    mc = make_mc_decoder(code.qc, info_pos, 12, "spa", schedule="layered",
                         track_norm=False, check_every=2)
    n_steps = W // batch

    def step_full(key):
        k_u, k_n = jax.random.split(key)
        u = random_info_bits(k_u, batch, code.k)
        wT = encode_T(u)
        seeds = jax.lax.bitcast_convert_type(
            jax.random.bits(k_n, (2,), jnp.uint32), jnp.int32)
        err, ok, conv, norm, it = mc(wT, cvec, seeds)
        stats = BlockStats(error_bits=err, ok=ok, conv_iter=conv,
                           norm_llr=norm)
        return reduce_block_stats(stats, jnp.ones((batch,), bool))

    def step_nokernel(key):
        """Everything EXCEPT the pallas decode: PRNG + encode + a reduce
        over a fake stats tuple derived from wT (kernel cost removed)."""
        k_u, k_n = jax.random.split(key)
        u = random_info_bits(k_u, batch, code.k)
        wT = encode_T(u)
        _ = jax.random.bits(k_n, (2,), jnp.uint32)
        col = wT[0].astype(jnp.int32)
        stats = BlockStats(error_bits=col, ok=col > 0,
                           conv_iter=col, norm_llr=wT[1])
        return reduce_block_stats(stats, jnp.ones((batch,), bool))

    def chunk(step):
        def f(key0):
            keys = jax.vmap(lambda j: jax.random.fold_in(key0, j))(
                jnp.arange(n_steps))

            def body(tot, key):
                return tot + step(key), 0

            tot, _ = jax.lax.scan(body, BlockCounters.zeros(), keys)
            return tot.blocks

        return jax.jit(f)

    def timeit(fn, label):
        int(fn(jax.random.key(1)))  # compile + warm (host fetch = barrier)
        ts = []
        for r in range(args.rounds):
            t0 = time.perf_counter()
            int(fn(jax.random.fold_in(jax.random.key(2), r)))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{label:28s} {med * 1e3:8.2f} ms/window "
              f"({med / n_steps * 1e6:7.1f} us/batch)", flush=True)
        return med

    t_full = timeit(chunk(step_full), "scan(prng+encode+mc+reduce)")
    t_nok = timeit(chunk(step_nokernel), "scan(prng+encode+reduce)")
    result["isolation"] = {
        "n_steps": n_steps, "batch": batch,
        "full_s": t_full, "no_kernel_s": t_nok,
        "kernel_s": t_full - t_nok,
        "kernel_us_per_batch": (t_full - t_nok) / n_steps * 1e6,
        "xla_us_per_batch": t_nok / n_steps * 1e6,
    }
    print(f"# attribution: pallas kernel {(t_full - t_nok) / n_steps * 1e6:.0f} "
          f"us/batch, XLA step ops {t_nok / n_steps * 1e6:.0f} us/batch",
          flush=True)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "binder.json").write_text(json.dumps(result, indent=1))
    print(f"# wrote {out}/binder.json", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
