"""Vectorized channel models: modulation, noise, per-bit LLRs.

Re-implements the reference channel (`python_ldpc_app/channel.py`) as a pure
batched function: BPSK (0 -> -1, 1 -> +1) / QPSK-proxy (+-0.7) modulation
(channel.py:47-51) and three interference modes:

  mode 1: AWGN.              LLR = 2 y / sigma1^2            (channel.py:54-81)
  mode 2: AWGN + partial-band interference: with probability p a bit also
          receives a second Gaussian; LLR = (bit+n1[+n2]) * L_c2 or * L_c1
          (channel.py:83-95)
  mode 3: AWGN + barrage jamming: convex mix scaled by L_c3 (channel.py:97-100)

Scale factors L_c1/L_c2/L_c3 and sigmas follow `channel.py:102-119` exactly.

The per-SNR scale factors are *runtime scalars* (ChannelConsts) so an SNR
sweep reuses one compiled step instead of recompiling per point; only the
mode/modulation/noise-model are compile-time static.

True Gray M-QAM (4/16/64, ldpc_tpu.ops.modem) works under all three modes:
mode 2 jams whole complex symbols and demaps with the matched per-symbol
noise variance; mode 3 adds the reference's barrage noise n1 + p*n2.

Noise model quirk: the reference deliberately replicates a C++ bug in mode 1,
drawing noise with sigma**2 passed as the *standard deviation*
(`channel.py:55-68`), which makes its nominal SNR axis much cleaner than
physical. ``noise_model='legacy'`` reproduces that for BER-curve parity;
``noise_model='exact'`` uses the correct sigma. Modes 2/3 in the reference
use a Park-Miller LCG re-seeded identically per channel instance -- its
multiprocess path therefore replays the same noise in every block (a bug);
here every bit draws from a counter-based JAX PRNG.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ChannelConsts(NamedTuple):
    """Runtime per-SNR-point scalars (traced; change without recompiling)."""

    noise1_std: jax.Array  # mode-1 noise stddev (legacy: sigma^2, exact: sigma)
    llr_scale: jax.Array  # mode-1 LLR factor 2 / sigma1^2
    sigma1: jax.Array
    sigma2: jax.Array
    l_c1: jax.Array
    l_c2: jax.Array
    l_c3: jax.Array
    p: jax.Array


@dataclass(frozen=True)
class ChannelParams:
    """Host-side channel configuration for one SNR point."""

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

    def consts(self) -> ChannelConsts:
        sigma1 = self.sigma1
        noise1_std = sigma1**2 if self.noise_model == "legacy" else sigma1
        f32 = jnp.float32
        return ChannelConsts(
            noise1_std=f32(noise1_std),
            llr_scale=f32(2.0 / (sigma1**2)),
            sigma1=f32(sigma1),
            sigma2=f32(self.sigma2),
            l_c1=f32(self.l_c1),
            l_c2=f32(self.l_c2),
            l_c3=f32(self.l_c3),
            p=f32(self.p),
        )


def make_channel_fn(mode: int, modulation: int = 1, n: int | None = None):
    """Build ``channel(key, bits: f32 [B, n], consts: ChannelConsts) -> llr``.

    ``bits`` are codeword bits in {0, 1}; returns per-bit channel LLRs with
    the reference's sign convention (LLR > 0 <=> bit 1).

    ``modulation``: 1 = BPSK, 2 = the reference's +-0.7 QPSK proxy
    (channel.py:47-51), 4/16/64 = true Gray-mapped square QAM with max-log
    per-bit LLRs (ldpc_tpu.ops.modem; requires ``n``). QAM supports all
    three interference modes: mode 2 jams whole symbols (both I and Q) with
    probability p and demaps with the per-symbol matched noise variance --
    the complex-symbol analogue of the reference's jam-state-aware L_c2/L_c1
    selection (channel.py:88-95); mode 3 follows the reference's barrage
    structure y = s + n1 + p*n2 (channel.py:97-100), i.e. AWGN with
    effective per-dimension variance (sigma1^2 + p^2 sigma2^2)/bps.
    """
    if modulation in (4, 16, 64):
        if n is None:
            raise ValueError("QAM channels need the codeword length n")
        # NOTE: the QAM path always uses exact noise physics; the legacy
        # sigma^2-as-stddev quirk is a BPSK-specific reference behavior.
        # Callers must request noise_model='exact' (validated at the
        # ChannelParams/runner level) so BPSK and QAM SNR axes stay
        # comparable.
        from ldpc_tpu.ops.modem import make_qam_modem, qam_spec

        bps, _, _ = qam_spec(modulation)
        modulate, demap = make_qam_modem(modulation, n)

        # Per-dimension noise variance N0/2; Es/N0 = speed*bps*snr is folded
        # into sigma1 = 1/sqrt(2*speed*snr), so var = sigma^2 / bps. Only
        # this variance differs between modes -- scalar for 1/3, per-symbol
        # [B, n_sym] for the jam-state-aware mode 2.
        if mode == 1:
            def noise_var_fn(kJ, c, shape):
                return (c.sigma1**2) / bps
        elif mode == 2:
            def noise_var_fn(kJ, c, shape):
                # a partial-band jammer hits the whole complex symbol: one
                # Bernoulli(p) draw per symbol, shared by the I and Q dims
                # (sigma2 embeds the 1/p duty cycle)
                jam = (
                    jax.random.uniform(kJ, shape, dtype=jnp.float32) < c.p
                ).astype(jnp.float32)
                return (c.sigma1**2 + jam * c.sigma2**2) / bps
        elif mode == 3:
            def noise_var_fn(kJ, c, shape):
                # reference barrage: y = s + n1 + p*n2 (channel.py:97-100)
                return (c.sigma1**2 + (c.p**2) * c.sigma2**2) / bps
        else:
            raise ValueError(f"Unknown channel mode: {mode}")

        def channel(key, bits, c: ChannelConsts):
            kI, kQ, kJ = jax.random.split(key, 3)
            yI, yQ = modulate(bits)
            noise_var = noise_var_fn(kJ, c, yI.shape)
            std = jnp.sqrt(noise_var)
            yI = yI + std * jax.random.normal(kI, yI.shape, dtype=jnp.float32)
            yQ = yQ + std * jax.random.normal(kQ, yQ.shape, dtype=jnp.float32)
            # demap with the true (matched) variance the noise was drawn at
            return demap(yI, yQ, noise_var)

        return channel

    if modulation not in (1, 2):
        raise ValueError(
            f"Unknown modulation {modulation}: 1=BPSK, 2=QPSK proxy, "
            f"4/16/64=Gray QAM"
        )
    amp = 1.0 if modulation == 1 else 0.7

    if mode == 1:

        def channel(key, bits, c: ChannelConsts):
            sym = (2.0 * bits - 1.0) * amp
            noise = c.noise1_std * jax.random.normal(key, bits.shape, dtype=jnp.float32)
            return c.llr_scale * (sym + noise)

        return channel

    if mode == 2:

        def channel(key, bits, c: ChannelConsts):
            k1, k2, k3 = jax.random.split(key, 3)
            sym = (2.0 * bits - 1.0) * amp
            n1 = c.sigma1 * jax.random.normal(k1, bits.shape, dtype=jnp.float32)
            n2 = c.sigma2 * jax.random.normal(k2, bits.shape, dtype=jnp.float32)
            jammed = jax.random.uniform(k3, bits.shape, dtype=jnp.float32) < c.p
            return jnp.where(jammed, (sym + n1 + n2) * c.l_c2, (sym + n1) * c.l_c1)

        return channel

    if mode == 3:

        def channel(key, bits, c: ChannelConsts):
            k1, k2 = jax.random.split(key)
            sym = (2.0 * bits - 1.0) * amp
            n1 = c.sigma1 * jax.random.normal(k1, bits.shape, dtype=jnp.float32)
            n2 = c.sigma2 * jax.random.normal(k2, bits.shape, dtype=jnp.float32)
            return ((sym + n1 + n2) * c.p + (sym + n1) * (1.0 - c.p)) * c.l_c3

        return channel

    raise ValueError(f"Unknown channel mode: {mode}")


def make_channel(params: ChannelParams, n: int | None = None):
    """Convenience wrapper: closes over a single SNR point's constants.
    ``n`` (codeword length) is required for the QAM modulations."""
    if params.modulation in (4, 16, 64) and params.noise_model == "legacy":
        raise ValueError(
            "QAM modulations use exact noise physics; the legacy "
            "sigma^2-as-stddev quirk is BPSK-specific -- set "
            "noise_model='exact'"
        )
    fn = make_channel_fn(params.mode, params.modulation, n=n)
    consts = params.consts()

    def channel(key, bits):
        return fn(key, bits, consts)

    return channel
