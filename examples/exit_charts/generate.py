"""Generate the EXIT chart example artifacts.

Charts the 802.16e rate-1/2 protograph against the (3,6)-regular ensemble
at three operating points around their Gaussian-approximation thresholds,
plus a threshold comparison table (exit_thresholds.json). Runs on CPU in
seconds: the analysis is closed-form (ldpc_tpu.analysis.exit).

Usage: JAX_PLATFORMS=cpu python examples/exit_charts/generate.py
"""

from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ldpc_tpu.analysis import exit_threshold, regular_protograph
    from ldpc_tpu.models.qc import detect_qc
    from ldpc_tpu.models.standards import wimax
    from ldpc_tpu.sim.visualization import plot_exit_chart

    qc = detect_qc(wimax(576, "1/2"))
    reg = regular_protograph(3, 6)

    thr_wimax = exit_threshold(qc, rate=0.5, lo_db=-0.5, hi_db=3.0)
    thr_reg = exit_threshold(reg, rate=0.5, lo_db=-0.5, hi_db=3.0)
    print(f"GA threshold: wimax R1/2 {thr_wimax:.3f} dB, "
          f"(3,6)-regular {thr_reg:.3f} dB")

    with open(os.path.join(HERE, "exit_thresholds.json"), "w") as f:
        json.dump(
            {
                "wimax_576_1/2_ga_threshold_db": round(thr_wimax, 3),
                "regular_3_6_ga_threshold_db": round(thr_reg, 3),
                "regular_3_6_true_de_db": 1.11,
                "note": "Gaussian-approximation (EXIT) thresholds; the "
                        "sampled-DE module measures wimax ~0.8 dB (GA is "
                        "optimistic for irregular ensembles).",
            },
            f,
            indent=2,
        )

    for graph, name, thr in ((qc, "wimax576_r12", thr_wimax),
                             (reg, "regular_3_6", thr_reg)):
        for delta, tag in ((-0.3, "below"), (0.15, "near"), (1.0, "above")):
            ebno = thr + delta
            fig = plot_exit_chart(
                graph, ebno, 0.5,
                title=f"{name} EXIT chart @ {ebno:.2f} dB "
                      f"({tag} GA threshold {thr:.2f} dB)",
                save_path=os.path.join(HERE, f"{name}_{tag}.png"),
            )
            plt.close(fig)
    print(f"wrote 6 charts + exit_thresholds.json to {HERE}")


if __name__ == "__main__":
    main()
