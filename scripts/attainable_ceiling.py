"""Locate the ATTAINABLE ceiling of the fused decode kernel (round-5 item 5).

The committed roofline brackets the flagship headline between two bounds a
factor ~7 apart (examples/roofline/README.md): the all-serial dependent-
chain floor (0.83 G info bits/s) and the perfect-issue census ceiling
(5.83 G). Neither is what the hardware can actually sustain on this op
mix. This script measures that missing number with a dependency-free
microkernel (ldpc_tpu.analysis.roofline.measure_mix_rate): the SAME op
histogram as the production two-phase frame stream, executed as S
independent value chains so the scheduler can fill the 4-wide ALUs.

The ``streams`` sweep doubles as an ILP ladder: streams=1 reproduces the
serial floor, streams=2 approximates the paired-layer kernel's two
dependence chains, and the plateau is the mix's achievable ceiling --
converting "30% of an unattainable ideal" into "X% of attainable" and
telling us whether further MFU work has real headroom.

Writes examples/roofline/attainable.json and prints the four-line
accounting (achieved / floor / attainable / issue-peak).

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/attainable_ceiling.py
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/roofline")
    ap.add_argument("--streams", default="1,2,4,8,16")
    args = ap.parse_args()

    from ldpc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from ldpc_tpu.analysis.roofline import (
        measure_mix_rate,
        speed_of_light_two_phase,
        vpu_peak_ops_per_s,
    )
    from ldpc_tpu.sim.runner import load_code

    out = Path(args.out)
    base = json.loads((out / "roofline.json").read_text())
    code = load_code(f"builtin:{base['code']}")
    dev = jax.devices()[0].device_kind
    print(f"# device={dev} code={base['code']}", flush=True)

    # the production frame stream's op histogram (census, two-phase
    # weighted): recomputed from the committed trip model so the mix the
    # microkernel runs is exactly the mix the ceiling priced
    sol = speed_of_light_two_phase(
        code.qc, k=code.k, variant="spa", schedule="layered", mode=1,
        track_norm=False, phase1=base["trip_model"].get("phase1", None),
        trip_model=base["trip_model"],
        peak_ops_per_s=vpu_peak_ops_per_s(dev),
        check_every=base.get("check_every", 2),
    )
    mix = sol["frame_ops_by_class"]
    frame_ops = sol["frame_ops"]
    print(f"# frame mix: { {c: round(v) for c, v in mix.items() if v} }",
          flush=True)

    ladder = {}
    for s in (int(v) for v in args.streams.split(",")):
        r = measure_mix_rate(mix, streams=s, verbose=True)
        ladder[str(s)] = r
        att = code.k / (frame_ops / r["census_ops_per_s"])
        print(
            f"# streams={s:2d}: {r['census_ops_per_s'] / 1e12:.2f} T "
            f"census ops/s -> attainable {att / 1e9:.2f} G info bits/s "
            f"(stabilizer overhead {r['stabilizer_frac'] * 100:.0f}%)",
            flush=True,
        )

    best = max(ladder.values(), key=lambda r: r["census_ops_per_s"])
    attainable = code.k / (frame_ops / best["census_ops_per_s"])
    achieved = base["achieved_info_bits_per_s"]
    result = {
        "device": dev,
        "code": base["code"],
        "frame_ops": frame_ops,
        "frame_mix": mix,
        "streams_ladder": ladder,
        "attainable_census_ops_per_s": best["census_ops_per_s"],
        "attainable_info_bits_per_s": attainable,
        "achieved_info_bits_per_s": achieved,
        "floor_info_bits_per_s": base["floor_info_bits_per_s"],
        "issue_peak_info_bits_per_s": base["ceiling_info_bits_per_s"],
        "fraction_of_attainable": achieved / attainable,
    }
    (out / "attainable.json").write_text(json.dumps(result, indent=1))
    print("#")
    print(f"# measured floor      {base['floor_info_bits_per_s'] / 1e9:6.2f} G  (serial dependent chains)")
    print(f"# achieved            {achieved / 1e9:6.2f} G")
    print(f"# attainable          {attainable / 1e9:6.2f} G  (mix at full ILP, measured)")
    print(f"# issue peak          {base['ceiling_info_bits_per_s'] / 1e9:6.2f} G  (perfect scheduling)")
    print(f"# achieved/attainable {100 * achieved / attainable:.1f}%")
    print(f"# wrote {out}/attainable.json", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
