"""BER / FER / convergence accounting with the reference's conventions.

Reference quirks faithfully reproduced (see main.py:124-146, 319-339):
  * FER counts frames whose decode result != OK.
  * BER counts erroneous info bits ONLY for failed frames; converged frames
    contribute zero error bits by construction of the syndrome check. (A
    converged frame can in principle land on a wrong codeword -- an
    undetected error -- which the reference silently scores as error-free.
    ``exact=True`` counts those too.)
  * Decoded bits are stored inverted (z = 1 <=> LLR < 0); comparisons
    re-invert (main.py:137). Our DecodeResult.est already holds z ^ 1, the
    estimated bits, so comparison is direct.
  * avg convergence iterations average over converged frames only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BlockCounters(NamedTuple):
    """Summable per-batch counters (all scalars, f64-safe int32/float32)."""

    blocks: jax.Array  # int32: codewords processed
    ok_blocks: jax.Array  # int32: frames decoded OK
    error_bits: jax.Array  # int32: info-bit errors (failed frames only unless exact)
    fer_frames: jax.Array  # int32: failed frames
    norm_llr_sum: jax.Array  # f32: sum of per-frame normalized-LLR summaries
    conv_iters_sum: jax.Array  # int32: sum of convergence iterations (converged)
    conv_count: jax.Array  # int32: number of converged frames

    def __add__(self, other: "BlockCounters") -> "BlockCounters":
        return BlockCounters(*(a + b for a, b in zip(self, other)))

    @staticmethod
    def zeros() -> "BlockCounters":
        z32 = jnp.int32(0)
        return BlockCounters(z32, z32, z32, z32, jnp.float32(0.0), z32, z32)


def count_block_metrics(
    u: jax.Array,  # uint8 [B, k] original info bits
    result,  # DecodeResult
    info_pos: jax.Array,  # int32 [k] positions of info bits in the codeword
    exact: bool = False,
) -> BlockCounters:
    decoded_info = jnp.take(result.est, info_pos, axis=1)
    errs = jnp.sum(decoded_info != u.astype(decoded_info.dtype), axis=1).astype(
        jnp.int32
    )
    if not exact:
        # reference: bits counted only when decode failed (main.py:134)
        errs = jnp.where(result.ok, 0, errs)
    converged = result.conv_iter >= 0
    return BlockCounters(
        blocks=jnp.int32(u.shape[0]),
        ok_blocks=jnp.sum(result.ok).astype(jnp.int32),
        error_bits=jnp.sum(errs).astype(jnp.int32),
        fer_frames=jnp.sum(~result.ok).astype(jnp.int32),
        norm_llr_sum=jnp.sum(result.norm_llr).astype(jnp.float32),
        conv_iters_sum=jnp.sum(jnp.where(converged, result.conv_iter, 0)).astype(
            jnp.int32
        ),
        conv_count=jnp.sum(converged).astype(jnp.int32),
    )
