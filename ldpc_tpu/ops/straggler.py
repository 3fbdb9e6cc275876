"""Two-phase straggler compaction around any batched decoder.

At a waterfall operating point (FER ~1e-2) almost every batch tile contains
at least one failing codeword, so per-tile syndrome early exit cannot fire
and the whole batch pays the full iteration budget for the <2% of stragglers
(the reference pays this in spades: its per-codeword Python loop runs
max_iterations on every failure, spa_decoder.py:244-253).

The fix is a screen-then-recompact schedule built from STATIC shapes only:

  phase 1  decode the full batch with a short iteration budget
           (``screen_iters``); converged codewords are final.
  compact  order codewords by phase-1 convergence (argsort of the ok flags:
           failures first) and take a fixed-capacity slice.
  phase 2  re-decode that slice FROM SCRATCH with the full budget and
           scatter the results back.

Because the decoder is a deterministic function of the channel LLRs, a
phase-2 re-decode replays exactly the trajectory a single full-budget pass
would have taken -- so ok / est / conv_iter / norm_llr are BITWISE IDENTICAL
to single-pass decoding (asserted in tests/test_straggler.py), while the
batch pays ``screen_iters + capacity_frac * max_iterations`` instead of
``max_iterations`` iterations. If more codewords than the compaction
capacity fail the screen, a `lax.cond` falls back to re-decoding the whole
batch with the full budget -- still bit-exact, just not faster for that
batch (the sequential runner additionally gates the straggler per SNR point
on the first batch's FER, runner.py).

CAVEAT: under vmap (e.g. the parallel SNR sweep) a batched-predicate
`lax.cond` lowers to select and BOTH branches execute -- the wrapper would
then be strictly slower than plain decoding, so run_simulation_parallel
forces the straggler off.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ldpc_tpu.ops.spa import DecodeResult


def make_straggler_decoder(
    decode_screen,
    decode_full,
    capacity: int,
):
    """Wrap (short-budget, full-budget) decoders into a two-phase decoder.

    ``decode_screen`` / ``decode_full``: ``llr [B, n] -> DecodeResult`` built
    from the same layout/variant with different max_iterations.
    ``capacity``: static number of codewords re-decoded in phase 2 (rounded
    up internally by the caller to a tile multiple where that matters).
    """

    def decode(llr: jax.Array) -> DecodeResult:
        B = llr.shape[0]
        cap = min(capacity, B)

        r1 = decode_screen(llr)
        fail = ~r1.ok
        n_fail = jnp.sum(fail)

        # compact failure indices WITHOUT a sort (TPU sorts are slow):
        # pos[i] = rank of codeword i among failures; scatter i into slot
        # pos[i]. Slots beyond the failure count stay 0 and harmlessly
        # re-decode codeword 0 (deterministic -> identical scatter-back).
        pos = jnp.cumsum(fail) - 1
        slot = jnp.where(fail & (pos < cap), pos, cap)
        idx = (
            jnp.zeros((cap,), jnp.int32)
            .at[slot]
            .set(jnp.arange(B, dtype=jnp.int32), mode="drop")
        )

        def recompact(_):
            r2 = decode_full(llr[idx])
            # scatter phase-2 rows back; re-decoded already-converged rows
            # (when n_fail < cap) produce identical values, so the scatter
            # is unconditionally safe
            return DecodeResult(
                ok=r1.ok.at[idx].set(r2.ok),
                est=r1.est.at[idx].set(r2.est),
                conv_iter=r1.conv_iter.at[idx].set(r2.conv_iter),
                norm_llr=r1.norm_llr.at[idx].set(r2.norm_llr),
                iters_run=r1.iters_run + r2.iters_run,
            )

        def full_batch(_):
            r2 = decode_full(llr)
            return DecodeResult(
                ok=r2.ok,
                est=r2.est,
                conv_iter=r2.conv_iter,
                norm_llr=r2.norm_llr,
                iters_run=r1.iters_run + r2.iters_run,
            )

        return jax.lax.cond(n_fail <= cap, recompact, full_batch, None)

    return decode
