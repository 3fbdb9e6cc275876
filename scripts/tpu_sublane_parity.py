"""Hardware parity check: grouped (sublane_groups>1) kernels vs G=1, on TPU.

tests/test_sublane_groups.py proves the grouped re-layout bit-identical in
interpret mode on CPU; this script closes the same gap
scripts/tpu_two_phase_parity.py closed for two-phase: the grouped kernel
is a SEPARATELY COMPILED Mosaic program (block-diagonal rolls lower to
roll+select, the syndrome reduce to a rotate-max chain), and compiled-
program differences could in principle perturb results. Here the fused
Monte-Carlo kernel runs on the real chip with INJECTED noise (the same
uint32 draw planes feed both layouts), G in {2, 4, 8} vs G=1, across
schedules and operating points, and every per-codeword output -- err, ok,
conv, and the emitted LLR planes bit-for-bit -- must match exactly.

(The production hw-PRNG path draws different plane geometry per G by
design -- that is a seed-class difference, carried by the checkpoint
fingerprint -- so parity is provable only on the injected-noise path,
which exercises the identical decode arithmetic.)

Writes parity_runs/tpu_sublane_groups.json; exits nonzero on any
violation.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_sublane_parity.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    from ldpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from ldpc_tpu.ops.channel import ChannelParams
    from ldpc_tpu.ops.encode import make_encoder_T, random_info_bits
    from ldpc_tpu.ops.mc_pallas import (
        DRAWS_PER_BIT,
        consts_vector,
        make_mc_decoder,
    )
    from ldpc_tpu.models.qc import paired_layer_groups
    from ldpc_tpu.sim.runner import load_code

    code = load_code("builtin:CCSDS_ldpc_n32_k16.alist.txt")
    qc = code.qc
    spec = code.standard_encode_spec
    info_pos = np.asarray(spec.info_pos("orig"), np.int32)
    encode_T = make_encoder_T(spec, "orig")
    B = 4096
    dev = jax.devices()[0].device_kind
    report = {"device": dev, "code": code.name, "batch": B, "cases": []}
    failures = 0

    for snr_db, schedule, ce in ((4.0, "layered", 2), (5.65, "layered", 2),
                                 (5.65, "flooding", 1)):
        u = random_info_bits(jax.random.key(3), B, code.k)
        wT = encode_T(u)
        consts = ChannelParams(mode=1, snr_db=snr_db, speed=code.k / code.n,
                               noise_model="exact").consts()
        cv = consts_vector(consts)
        raw = jax.random.bits(jax.random.key(4),
                              (DRAWS_PER_BIT[1], code.n, B), jnp.uint32)
        seeds = jnp.zeros((2,), jnp.int32)
        kw = dict(schedule=schedule, noise_source="input", interpret=False,
                  track_norm=False, emit_llr=True, check_every=ce,
                  layer_groups=(paired_layer_groups(qc)
                                if schedule == "layered" else None))
        base = make_mc_decoder(qc, info_pos, 12, "spa", **kw)(
            wT, cv, seeds, raw)
        for G in (2, 4, 8):
            out = make_mc_decoder(qc, info_pos, 12, "spa",
                                  sublane_groups=G, **kw)(wT, cv, seeds, raw)
            case = {"snr_db": snr_db, "schedule": schedule,
                    "check_every": ce, "G": G, "mismatches": {}}
            for nm, a, b in zip(("err", "ok", "conv", "norm", "iters",
                                 "llr"), base, out):
                if nm == "iters":
                    continue  # tile-coupled trips legitimately differ
                d = int(np.sum(np.asarray(a) != np.asarray(b)))
                if d:
                    case["mismatches"][nm] = d
                    failures += 1
            case["ok_frac"] = float(np.mean(np.asarray(base[1])))
            report["cases"].append(case)
            print(f"{schedule}/ce{ce} @ {snr_db} dB G={G}: "
                  + ("OK (bit-exact incl. LLR planes, "
                     f"ok_frac {case['ok_frac']:.3f})"
                     if not case["mismatches"]
                     else f"MISMATCH {case['mismatches']}"),
                  flush=True)

    report["pass"] = failures == 0
    Path("parity_runs").mkdir(exist_ok=True)
    Path("parity_runs/tpu_sublane_groups.json").write_text(
        json.dumps(report, indent=1))
    print(f"# wrote parity_runs/tpu_sublane_groups.json pass={report['pass']}")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
