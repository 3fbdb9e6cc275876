"""Gray-mapped M-QAM modulation with max-log per-bit LLRs.

The reference supports BPSK and a +-0.7 "QPSK" amplitude proxy
(`channel.py:47-51`). This module adds true square M-QAM (QPSK, 16-QAM,
64-QAM): a square constellation factorizes into two independent
binary-reflected-Gray PAM axes, so both mapping and per-bit max-log LLRs are
small static vectorized operations over the sqrt(M)-point axis alphabet --
no per-bit control flow, XLA-friendly.

Conventions match the rest of the framework: input bits in {0, 1}, output
LLR > 0 <=> bit 1; unit average symbol energy; per-dimension noise variance
sigma^2 = N0/2 with Es/N0 = speed * bits_per_symbol * 10^(SNR/10) so the SNR
axis stays Eb/N0 when ``speed`` equals the code rate (the BPSK path's
convention, ldpc_tpu.ops.channel).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def gray_pam(bits_per_axis: int) -> np.ndarray:
    """Amplitude of each bit-label for binary-reflected-Gray M-PAM.

    Returns ``levels[label]``: the amplitude assigned to integer label
    b_0..b_{k-1} (MSB first), with levels (-(M-1), ..., -1, 1, ..., M-1)
    scaled later by the QAM normalization. Gray labeling: position index
    g in 0..M-1 carries label g ^ (g >> 1).
    """
    m = 1 << bits_per_axis
    amp = np.arange(-(m - 1), m, 2, dtype=np.float64)  # ascending positions
    levels = np.empty(m, dtype=np.float64)
    for pos in range(m):
        levels[pos ^ (pos >> 1)] = amp[pos]
    return levels


def qam_spec(order: int) -> tuple[int, np.ndarray, float]:
    """(bits_per_symbol, per-axis Gray levels, axis scale) for square M-QAM.

    The scale normalizes average symbol energy to 1:
    E[|s|^2] = 2 * scale^2 * (M_axis^2 - 1) / 3 = 1.
    """
    if order not in (4, 16, 64):
        raise ValueError(f"Unsupported QAM order: {order} (use 4, 16, 64)")
    bps = int(np.log2(order))
    per_axis = bps // 2
    m_axis = 1 << per_axis
    scale = float(np.sqrt(3.0 / (2.0 * (m_axis**2 - 1))))
    return bps, gray_pam(per_axis), scale


def make_qam_modem(order: int, n: int):
    """Build ``(modulate, demap)`` for length-``n`` codewords.

    modulate(bits f32 [B, n]) -> (I, Q) f32 [B, n/bps]
    demap(I, Q, noise_var)    -> llr f32 [B, n]   (max-log, LLR>0 <=> bit 1)
    """
    bps, levels, scale = qam_spec(order)
    if n % bps:
        raise ValueError(f"codeword length {n} not divisible by {bps} bits/symbol")
    per_axis = bps // 2
    n_sym = n // bps
    levels_s = jnp.asarray(levels * scale, jnp.float32)  # [m_axis]
    m_axis = levels.shape[0]
    # label bit b of axis-symbol index l (MSB first)
    label_bits = np.array(
        [[(l >> (per_axis - 1 - b)) & 1 for l in range(m_axis)]
         for b in range(per_axis)],
        dtype=bool,
    )
    lb = jnp.asarray(label_bits)  # [per_axis, m_axis]

    def axis_map(bits_axis: jax.Array) -> jax.Array:
        """bits [B, n_sym, per_axis] -> amplitudes [B, n_sym]."""
        weights = 2 ** jnp.arange(per_axis - 1, -1, -1, dtype=jnp.int32)
        labels = jnp.sum(bits_axis.astype(jnp.int32) * weights, axis=-1)
        return jnp.take(levels_s, labels)

    def modulate(bits: jax.Array):
        g = bits.reshape(bits.shape[0], n_sym, bps)
        return axis_map(g[..., :per_axis]), axis_map(g[..., per_axis:])

    def axis_llr(y: jax.Array, noise_var) -> jax.Array:
        """y [B, n_sym] -> per-bit max-log LLRs [B, n_sym, per_axis]."""
        d2 = (y[..., None] - levels_s) ** 2  # [B, n_sym, m_axis]
        big = jnp.float32(1e30)
        out = []
        for b in range(per_axis):
            mask1 = lb[b]  # [m_axis] True where bit b == 1
            d0 = jnp.min(jnp.where(mask1, big, d2), axis=-1)
            d1 = jnp.min(jnp.where(mask1, d2, big), axis=-1)
            out.append((d0 - d1) / (2.0 * noise_var))
        return jnp.stack(out, axis=-1)  # [B, n_sym, per_axis]

    def demap(yI: jax.Array, yQ: jax.Array, noise_var) -> jax.Array:
        li = axis_llr(yI, noise_var)
        lq = axis_llr(yQ, noise_var)
        llr = jnp.concatenate([li, lq], axis=-1)  # [B, n_sym, bps]
        return llr.reshape(yI.shape[0], n_sym * bps)

    return modulate, demap
