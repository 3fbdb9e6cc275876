"""Independent float64 numpy SPA used as the numerical ground truth in tests.

Mirrors the reference decoder's algorithm (python_ldpc_app/spa_decoder.py:63-280)
step for step -- including its clipping constants, its log(p1/p0) message
convention ('legacy' rule), its hard-decision/syndrome conventions and the
normalized-LLR metric -- but written directly from the algorithm description
against the EdgeLayout structures (per-check adjacency lists).
"""

from __future__ import annotations

import numpy as np

TANH_IN_CLIP = 17.5
PROD_CLIP = 0.99999999999999878
LLR_WINDOW = 7.0


def decode_reference(
    layout,
    info_pos: np.ndarray,
    llr: np.ndarray,
    max_iterations: int,
    rule: str = "legacy",
):
    """Decode one codeword. Returns (ok, est_bits, conv_iter, norm_llr)."""
    n, m = layout.n, layout.m
    sign = -1.0 if rule == "exact" else 1.0
    llr = sign * np.asarray(llr, dtype=np.float64)
    k = len(info_pos)

    # adjacency from the padded layout
    checks = [
        [int(v) for v in layout.chk_var[c] if v < n] for c in range(m)
    ]

    # messages keyed per (check, position-in-check)
    M = {c: np.array([llr[v] for v in checks[c]]) for c in range(m)}
    prior = llr.copy()
    norm_llr = 0.0

    for it in range(max_iterations):
        # check-node update with leave-one-out products
        E = {}
        for c in range(m):
            vals = M[c] / 2.0
            t = np.tanh(np.clip(vals, -TANH_IN_CLIP, TANH_IN_CLIP))
            t = np.clip(t, -PROD_CLIP, PROD_CLIP)
            total = np.prod(t)
            outs = np.empty_like(t)
            for i in range(len(t)):
                if abs(t[i]) > 1e-10:
                    loo = total / t[i]
                else:
                    loo = np.prod(np.delete(t, i))
                outs[i] = 2.0 * np.arctanh(np.clip(loo, -PROD_CLIP, PROD_CLIP))
            E[c] = outs

        # posterior
        L = llr.copy()
        for c in range(m):
            for i, v in enumerate(checks[c]):
                L[v] += E[c][i]

        if rule == "exact":
            est = (L < 0).astype(np.uint8)
        else:
            est = (L >= 0).astype(np.uint8)  # z ^ 1

        # syndrome
        ok = True
        for c in range(m):
            if sum(int(est[v]) for v in checks[c]) % 2:
                ok = False
                break

        flips = sum(
            1
            for i in info_pos
            if abs(L[i]) <= LLR_WINDOW and prior[i] * L[i] < 0.0
        )
        norm_llr = flips / k if k else 0.0

        if ok:
            return True, est, it, norm_llr
        if it == max_iterations - 1:
            return False, est, -1, norm_llr

        # variable-node update
        for c in range(m):
            M[c] = np.array([L[v] for v in checks[c]]) - E[c]
        prior = L

    return False, est, -1, norm_llr
