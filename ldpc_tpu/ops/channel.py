"""Vectorized channel models: modulation, noise, per-bit LLRs.

Re-implements the reference channel (`python_ldpc_app/channel.py`) as a pure
batched function: BPSK (0 -> -1, 1 -> +1) / QPSK-proxy (+-0.7) modulation and
three interference modes:

  mode 1: AWGN.              LLR = 2 y / sigma1^2            (channel.py:54-81)
  mode 2: AWGN + partial-band interference: with probability p a bit also
          receives a second Gaussian; LLR = (bit+n1[+n2]) * L_c2 or * L_c1
          (channel.py:83-95)
  mode 3: AWGN + barrage jamming: convex mix scaled by L_c3 (channel.py:97-100)

Scale factors L_c1/L_c2/L_c3 and sigmas follow `channel.py:102-119` exactly.

Noise model quirk: the reference deliberately replicates a C++ bug in mode 1,
drawing noise with sigma**2 passed as the *standard deviation*
(`channel.py:55-68`). ``noise_model='legacy'`` (default, for BER-curve parity
with the reference) reproduces that; ``noise_model='exact'`` uses the
physically correct sigma. Modes 2/3 in the reference use a Park-Miller LCG
reseeded identically per channel instance -- we use proper counter-based JAX
PRNG instead (the reference's multiprocess path replays the same noise in
every block, which is a bug, not a behavior worth keeping).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ChannelParams:
    """Static per-SNR-point channel configuration (hashable -> jit static)."""

    mode: int = 1  # 1=AWGN, 2=partial-band, 3=jamming
    modulation: int = 1  # 1=BPSK, 2=QPSK-proxy (+-0.7)
    speed: float = 1.0  # code rate factor in Eb/N0 scaling
    snr_db: float = 0.0  # signal SNR (sn1)
    interference_snr_db: float = 1.0  # interference SNR (sn2), modes 2/3
    p: float = 0.1  # interference probability / mix weight (gamma)
    noise_model: str = "legacy"  # 'legacy' (sigma^2-as-stddev quirk) | 'exact'

    # ----- derived quantities (channel.py:102-119) -----

    @property
    def l_c1(self) -> float:
        return 4.0 * self.speed * (10.0 ** (self.snr_db * 0.1))

    @property
    def l_c2(self) -> float:
        sn1 = 10.0 ** (self.snr_db * 0.1)
        sn2 = 10.0 ** (self.interference_snr_db * 0.1)
        return 4.0 * self.speed / ((1.0 / sn1) + (1.0 / (sn2 * self.p)))

    @property
    def l_c3(self) -> float:
        sn1 = 10.0 ** (self.snr_db * 0.1)
        sn2 = 10.0 ** (self.interference_snr_db * 0.1)
        return 4.0 * self.p * self.speed / (1.0 / sn2 + 1.0 / sn2) + (
            4.0 * self.speed * (1.0 - self.p) * sn1
        )

    @property
    def sigma1(self) -> float:
        return 1.0 / math.sqrt(2.0 * self.speed * (10.0 ** (self.snr_db * 0.1)))

    @property
    def sigma2(self) -> float:
        sn2 = 10.0 ** (self.interference_snr_db * 0.1)
        if self.mode == 2:
            return 1.0 / math.sqrt(2.0 * self.speed * (sn2 * self.p))
        return 1.0 / math.sqrt(2.0 * self.speed * sn2)


def make_channel(params: ChannelParams):
    """Build ``channel(key, bits: f32 [B, n]) -> llr: f32 [B, n]``.

    ``bits`` are codeword bits in {0, 1}; returns per-bit channel LLRs with
    the reference's sign convention (LLR > 0 <=> bit 1).
    """
    amp = 1.0 if params.modulation == 1 else 0.7
    mode = params.mode
    sigma1 = params.sigma1
    noise1_std = sigma1**2 if params.noise_model == "legacy" else sigma1

    if mode == 1:
        llr_scale = 2.0 / (sigma1**2)

        def channel(key: jax.Array, bits: jax.Array) -> jax.Array:
            sym = (2.0 * bits - 1.0) * amp
            noise = noise1_std * jax.random.normal(key, bits.shape, dtype=jnp.float32)
            return llr_scale * (sym + noise)

        return channel

    sigma2 = params.sigma2
    p = params.p

    if mode == 2:
        l_c1, l_c2 = params.l_c1, params.l_c2

        def channel(key: jax.Array, bits: jax.Array) -> jax.Array:
            k1, k2, k3 = jax.random.split(key, 3)
            sym = (2.0 * bits - 1.0) * amp
            n1 = sigma1 * jax.random.normal(k1, bits.shape, dtype=jnp.float32)
            n2 = sigma2 * jax.random.normal(k2, bits.shape, dtype=jnp.float32)
            jammed = jax.random.uniform(k3, bits.shape, dtype=jnp.float32) < p
            return jnp.where(
                jammed, (sym + n1 + n2) * l_c2, (sym + n1) * l_c1
            )

        return channel

    if mode == 3:
        l_c3 = params.l_c3

        def channel(key: jax.Array, bits: jax.Array) -> jax.Array:
            k1, k2 = jax.random.split(key)
            sym = (2.0 * bits - 1.0) * amp
            n1 = sigma1 * jax.random.normal(k1, bits.shape, dtype=jnp.float32)
            n2 = sigma2 * jax.random.normal(k2, bits.shape, dtype=jnp.float32)
            return ((sym + n1 + n2) * p + (sym + n1) * (1.0 - p)) * l_c3

        return channel

    raise ValueError(f"Unknown channel mode: {mode}")
