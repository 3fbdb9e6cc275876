"""Measure fused-kernel throughput + FER per decoder variant at the bench point.

Runs on the real TPU (cwd must be /root/repo for the axon backend). For each
decoder variant at the wimax_1152_0.5 / Eb/N0 2 dB / layered operating point,
times run_point windows (median) and reports FER -- the data for deciding
whether a transcendental-free min-sum variant can replace SPA in bench.py
without conceding error-correction quality (reference flooding-20 SPA
measures FER 0.011 at this point).

Usage: python scripts/variant_perf.py [config ...]
  config = variant:iters[:alpha[:beta]]   e.g. normalized_minsum:12:0.8125
"""

from __future__ import annotations

import sys

import jax


def measure(code, variant, iters, alpha=0.75, beta=0.15,
            n_batches=64, n_windows=3, batch=4096, msg_store="f32"):
    from bench import measure_point
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor

    opts = SimOptions(
        matrix=code.path or code.name,
        blocks=batch,
        iterations=iters,
        ber=True,
        fer=True,
        fidelity="exact",
        batch=batch,
        seed=0,
        speed=0.5,
        schedule="layered",
        decoder=("sum-product" if variant == "spa" else variant),
        minsum_alpha=alpha,
        minsum_beta=beta,
        msg_store=msg_store,
    )
    ex = PointExecutor(code, opts)
    # bench.py's timing methodology (shared helper), shorter windows: the
    # table compares variants within one session, not across documents
    med, _, fer, bits = measure_point(
        ex, code, 2.0, batch=batch, n_batches=n_batches,
        n_windows=n_windows, warmup_batches=n_batches, warmup_runs=1,
    )
    tag = variant + ("+int8msg" if msg_store == "int8" else "")
    print(
        f"{tag:26s} it={iters:2d} a={alpha:.4f} b={beta:.2f} "
        f"kernel={ex.kernel_used} FER={fer:.5f} "
        f"med_window={med:.3f}s bits/s={bits:,.0f}",
        flush=True,
    )
    return fer, bits


def main():
    from __graft_entry__ import _flagship_code

    code = _flagship_code()
    print(f"# device={jax.devices()[0].device_kind} code={code.name}",
          flush=True)
    configs = []
    for arg in sys.argv[1:]:
        parts = arg.split(":")
        v = parts[0]
        store = "f32"
        if v.endswith("+int8msg"):
            v, store = v[: -len("+int8msg")], "int8"
        it = int(parts[1]) if len(parts) > 1 else 12
        a = float(parts[2]) if len(parts) > 2 else 0.75
        b = float(parts[3]) if len(parts) > 3 else 0.15
        configs.append((v, it, a, b, store))
    if not configs:
        configs = [
            ("spa", 12, 0.75, 0.15, "f32"),
            ("normalized_minsum", 12, 0.75, 0.15, "f32"),
            ("normalized_minsum", 12, 0.8125, 0.15, "f32"),
            ("normalized_minsum", 12, 0.875, 0.15, "f32"),
            ("offset_minsum", 12, 0.75, 0.15, "f32"),
            ("minsum", 12, 0.75, 0.15, "f32"),
        ]
    for v, it, a, b, store in configs:
        try:
            measure(code, v, it, a, b, msg_store=store)
        except Exception as e:  # noqa: BLE001 - keep sweeping on one failure
            print(f"{v} it={it} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
