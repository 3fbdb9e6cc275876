"""Batched interleavers as permutation gathers/scatters.

Canonical convention (matching the reference's random interleaver,
`python_ldpc_app/interleavers.py:29-53` / `data_buffer.py:490-542`):

  pi = interleaving position indexes
  interleave (bits, before channel):  out[i]       = bits[pi[i]]
  deinterleave (LLRs, after channel): out[pi[i]]   = llr[i]

Implemented types:
  none     -- identity.
  regular  -- block (row/column) interleaver; dims = largest r <= sqrt(n)
              dividing n (data_buffer.py:460-475). The permutation is chosen
              so the channel sees the same bit order as the reference.
  random   -- a FRESH uniform permutation per codeword (the reference redraws
              per block): batched via argsort of iid uniforms.
  srandom  -- spread-S interleaver via the cooldown-counter construction
              (interleavers.py:120-166), generated once per run host-side.
              NOTE: the reference's main pipeline silently no-ops SRANDOM
              (data_buffer.py:508-519 dispatches only REGULAR/RANDOM); here it
              actually interleaves.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def regular_dims(n: int) -> tuple[int, int]:
    """Largest rows <= sqrt(n) that divides n; cols = n // rows."""
    rows = int(math.sqrt(n))
    while rows > 0 and n % rows != 0:
        rows -= 1
    if rows <= 0:
        return 0, 0
    return rows, n // rows


def regular_permutation(n: int) -> np.ndarray:
    """pi such that out[i] = bits[pi[i]] reproduces the reference's regular
    interleaver output order (new[col*rows + row] = old[row*cols + col])."""
    rows, cols = regular_dims(n)
    if rows == 0 or cols == 0:
        return np.arange(n, dtype=np.int32)
    return np.arange(n, dtype=np.int32).reshape(rows, cols).T.ravel()


def srandom_permutation(n: int, s: int, seed: int = 0) -> np.ndarray:
    """Spread-S permutation: any two source positions selected within s
    consecutive output slots are at distance >= s (cooldown construction)."""
    rng = np.random.default_rng(seed)
    cooldown = np.zeros(n, dtype=np.int64)  # 0 = free, -1 = taken, >0 cooling
    pi = np.zeros(n, dtype=np.int32)
    filled = 0
    while filled < n:
        cooling = cooldown > 0
        cooldown[cooling] -= 1
        free = np.nonzero(cooldown == 0)[0]
        if free.size == 0:
            continue  # let counters cool one step (matches reference loop)
        z = int(free[rng.integers(0, free.size)])
        cooldown[z] = -1
        lo, hi = max(0, z - s + 1), min(n - 1, z + s - 1)
        window = cooldown[lo : hi + 1]
        window[window != -1] = s
        pi[filled] = z
        filled += 1
    return pi


def make_interleaver(kind: str, n: int, s_param: int = 2, seed: int = 0):
    """Build ``(interleave, deinterleave)`` for bit arrays / LLR arrays [B, n].

    interleave(key, bits) -> (bits_interleaved, state)
    deinterleave(state, llr) -> llr_deinterleaved

    ``state`` carries the per-batch permutation for the random type (int32
    [B, n]) and is an empty placeholder otherwise.
    """
    kind = kind.lower()

    if kind == "none":
        def interleave(key, bits):
            return bits, ()

        def deinterleave(state, llr):
            return llr

        return interleave, deinterleave

    if kind in ("regular", "srandom") or kind.startswith("file:"):
        if kind == "regular":
            pi_np = regular_permutation(n)
        elif kind == "srandom":
            pi_np = srandom_permutation(n, s_param, seed)
        else:
            # custom static permutation from a .npy file ('file:<path>'):
            # bring-your-own interleaver (e.g. the adversarial symbol-
            # concentrating permutation of examples/burst_interleaver)
            pi_np = np.load(kind[5:]).astype(np.int32)
            if sorted(pi_np.tolist()) != list(range(n)):
                raise ValueError(
                    f"{kind}: not a permutation of 0..{n - 1} "
                    f"(shape {pi_np.shape})"
                )
        pi = jnp.asarray(pi_np)
        inv = jnp.asarray(np.argsort(pi_np).astype(np.int32))

        def interleave(key, bits):
            return jnp.take(bits, pi, axis=-1), ()

        def deinterleave(state, llr):
            # out[pi[i]] = llr[i]  <=>  out = llr[inv]
            return jnp.take(llr, inv, axis=-1)

        return interleave, deinterleave

    if kind == "random":
        def interleave(key, bits):
            u = jax.random.uniform(key, bits.shape)
            pi_b = jnp.argsort(u, axis=-1)  # iid uniforms -> uniform permutation
            out = jnp.take_along_axis(bits, pi_b, axis=-1)
            return out, pi_b

        def deinterleave(pi_b, llr):
            inv_b = jnp.argsort(pi_b, axis=-1)
            return jnp.take_along_axis(llr, inv_b, axis=-1)

        return interleave, deinterleave

    raise ValueError(f"Unknown interleaver type: {kind}")
