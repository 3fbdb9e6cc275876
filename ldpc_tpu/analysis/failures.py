"""Failure-structure profiling: error-weight histograms of failing frames.

The simulation pipeline reduces each batch to scalar counters; this module
keeps one more moment of the failure distribution -- a histogram over the
*info-bit error weight* of every frame the decoder got wrong -- computed
on-device inside a jitted scan (one host fetch per dispatch group), split:

* **detected** failures (syndrome check fails): the weight structure
  separates near-codeword / trapping-set events (small, repeatable weights,
  the error-floor mechanism) from channel noise overwhelming the decoder
  (weights near the uncoded error mass). Weight 0 is possible: all info
  bits right, residual errors confined to parity positions.
* **undetected** errors (syndrome passes, info bits wrong): the decoder
  converged to a DIFFERENT codeword; weights are bounded below by the
  minimum distance projected on the info positions. The reference's
  failed-frames-only BER accounting scores these frames as error-free
  (main.py:124-146) -- this profile measures what that convention hides.

Driven by scripts/error_floor.py; tested in tests/test_failures.py.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_profiler(executor, k_active: int):
    """Jitted scan of unfused MC steps -> on-device failure-weight histograms.

    Returns ``chunk(key_point, start, consts, n_steps) ->
    (hist_detected, hist_undetected, frames)`` where the histograms are
    f32[k_active+1] counts over info-bit error weight. Key folding matches
    PointExecutor.run_point, so the profiled stream IS the stream a normal
    run at this point would decode. Requires the executor built with
    fused='off' (per-frame stats) and exact_ber=True (undetected errors
    counted: metrics.block_stats).
    """
    step = executor._step
    nbins = k_active + 1

    @functools.partial(jax.jit, static_argnames="n_steps")
    def chunk(key_point, start, consts, n_steps: int):
        def body(carry, i):
            hd, hu, frames = carry
            key = jax.random.fold_in(key_point, start + i)
            stats, _ = step(key, consts)
            w = jnp.clip(stats.error_bits, 0, k_active)
            det = (~stats.ok).astype(jnp.float32)
            undet = (stats.ok & (stats.error_bits > 0)).astype(jnp.float32)
            hd = hd.at[w].add(det)
            hu = hu.at[w].add(undet)
            return (hd, hu, frames + np.float32(stats.ok.shape[0])), None

        init = (
            jnp.zeros(nbins, jnp.float32),
            jnp.zeros(nbins, jnp.float32),
            jnp.float32(0.0),
        )
        (hd, hu, frames), _ = jax.lax.scan(body, init, jnp.arange(n_steps))
        return hd, hu, frames

    return chunk


def profile_point(code, opts, snr_db: float, min_failures: int,
                  max_blocks: int, say=print, executor=None):
    """Decode until ``min_failures`` detected failures (or ``max_blocks``
    frames), histogramming failure weights on-device.

    ``opts`` must carry ``fused='off'`` and ``exact_ber=True``; see
    :func:`make_profiler`. Pass ``executor`` to reuse one compiled step
    across SNR points. Returns ``(hist_detected, hist_undetected, frames)``
    as numpy arrays / int.
    """
    from ldpc_tpu.ops.channel import ChannelParams
    from ldpc_tpu.sim.runner import PointExecutor

    ex = executor if executor is not None else PointExecutor(code, opts)
    # cache the jitted scan on the executor: jax.jit keys its compile cache
    # on the function object, so rebuilding it per point would recompile
    prof = getattr(ex, "_failure_profiler", None)
    if prof is None:
        prof = ex._failure_profiler = make_profiler(ex, ex.k_active)
    consts = ChannelParams(
        mode=opts.mode, modulation=opts.modulation, speed=opts.speed,
        snr_db=snr_db, interference_snr_db=opts.interference_snr, p=opts.p,
        noise_model=opts.noise_model,
    ).consts()
    key_point = jax.random.fold_in(jax.random.key(opts.seed), 0)
    hd = np.zeros(ex.k_active + 1)
    hu = np.zeros(ex.k_active + 1)
    frames = 0
    start = 0
    n_steps = 8
    t0 = time.time()
    while hd.sum() < min_failures and frames < max_blocks:
        d, u, f = prof(key_point, jnp.int32(start), consts, n_steps)
        hd += np.asarray(d)
        hu += np.asarray(u)
        frames += int(np.asarray(f))
        start += n_steps
        n_steps = min(n_steps * 2, 64)  # grow groups as the point gets deep
    say(
        f"  profiled {frames:,} frames in {time.time() - t0:.1f}s: "
        f"{int(hd.sum())} detected failures, {int(hu.sum())} undetected"
    )
    return hd, hu, frames


def profile_sweep(code, opts, snrs, min_failures: int, max_blocks: int,
                  say=print) -> dict:
    """Failure profile at each SNR in ``snrs`` with ONE compiled step.

    Returns ``{snr: {frames, detected, undetected, hist_detected,
    hist_undetected}}`` (JSON-ready; histograms as weight->count dicts).
    Used by scripts/error_floor.py and the CLI's ``--failure-profile``.
    """
    from ldpc_tpu.sim.runner import PointExecutor

    ex = PointExecutor(code, opts)
    out = {}
    for snr in snrs:
        say(f"profiling failures at {snr:g} dB")
        hd, hu, frames = profile_point(
            code, opts, snr, min_failures, max_blocks, say=say, executor=ex
        )
        out[snr] = {
            "frames": frames,
            "detected": weight_summary(hd),
            "undetected": weight_summary(hu),
            "hist_detected": {int(w): int(c) for w, c in enumerate(hd) if c},
            "hist_undetected": {int(w): int(c) for w, c in enumerate(hu) if c},
        }
    return out


def weight_summary(hist: np.ndarray) -> dict:
    """Percentile summary of a weight histogram (counts indexed by weight)."""
    total = hist.sum()
    if total == 0:
        return {"count": 0}
    w = np.arange(hist.size)
    cum = np.cumsum(hist)

    def pct(q):
        return int(w[np.searchsorted(cum, q * total)])

    return {
        "count": int(total),
        "min_weight": int(w[hist > 0][0]),
        "max_weight": int(w[hist > 0][-1]),
        "p10": pct(0.10),
        "median": pct(0.50),
        "p90": pct(0.90),
        "mean": float((hist * w).sum() / total),
    }
