"""Gray M-QAM modem (ldpc_tpu.ops.modem): analytic BER + coded sanity."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.ops.channel import ChannelParams, make_channel_fn
from ldpc_tpu.ops.modem import gray_pam, make_qam_modem, qam_spec


def _q(x: float) -> float:
    return 0.5 * math.erfc(x / math.sqrt(2.0))


def test_gray_pam_labels_adjacent_differ_one_bit():
    for bits in (1, 2, 3):
        levels = gray_pam(bits)
        # invert: label of each ascending amplitude position
        order = np.argsort(levels)
        for a, b in zip(order[:-1], order[1:]):
            assert bin(int(a) ^ int(b)).count("1") == 1


def test_qam_unit_energy():
    for order in (4, 16, 64):
        bps, levels, scale = qam_spec(order)
        es = 2.0 * np.mean((levels * scale) ** 2)
        assert es == pytest.approx(1.0, rel=1e-12)


def test_modulate_demap_roundtrip_noiseless():
    for order in (4, 16, 64):
        mod, demap = make_qam_modem(order, 96)
        bits = jax.random.bernoulli(jax.random.key(0), 0.5, (8, 96)).astype(
            jnp.float32
        )
        yI, yQ = mod(bits)
        llr = demap(yI, yQ, jnp.float32(0.01))
        assert np.array_equal(np.asarray(llr > 0), np.asarray(bits > 0.5))


@pytest.mark.parametrize("order,ebno_db", [(4, 4.0), (16, 8.0), (64, 12.0)])
def test_uncoded_ber_matches_theory(order, ebno_db):
    """Gray M-QAM uncoded BER ~= (4/m)(1-1/sqrt(M)) Q(sqrt(3 m /(M-1) EbN0))
    (tight at these operating points; QPSK is exactly Q(sqrt(2 EbN0)))."""
    n = 120_000
    bps = int(math.log2(order))
    chan = make_channel_fn(1, order, n=n)
    # Es/N0 = speed*bps*snr and Eb = Es/bps (uncoded), so speed=1 makes the
    # SNR axis exactly Eb/N0
    consts = ChannelParams(snr_db=ebno_db, speed=1.0, noise_model="exact").consts()
    key = jax.random.key(1)
    bits = jax.random.bernoulli(key, 0.5, (1, n)).astype(jnp.float32)
    llr = chan(jax.random.fold_in(key, 1), bits, consts)
    ber = float(jnp.mean((llr > 0) != (bits > 0.5)))

    ebno = 10.0 ** (ebno_db / 10.0)
    m_sq = int(math.sqrt(order))
    theory = (4.0 / bps) * (1.0 - 1.0 / m_sq) * _q(
        math.sqrt(3.0 * bps / (order - 1) * ebno)
    )
    if order == 4:
        theory = _q(math.sqrt(2.0 * ebno))
    assert ber == pytest.approx(theory, rel=0.15), (ber, theory)


def test_coded_16qam_end_to_end():
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor, load_code

    code = load_code("builtin:wimax_576_0.5.alist.txt")
    opts = SimOptions(
        matrix=code.name, blocks=128, iterations=15, ber=True, fer=True,
        fidelity="exact", batch=128, seed=0, modulation=16, speed=0.5,
        quiet=True,
    )
    ex = PointExecutor(code, opts)
    # rate-1/2 16-QAM needs ~4 dB more Eb/N0 than BPSK; 7 dB is comfortable
    stats = ex.run_point(7.0, 128, jax.random.key(0), 0)
    assert stats.ok_blocks == 128

    # and it must fail near 0 dB
    stats_low = ex.run_point(0.0, 128, jax.random.key(0), 1)
    assert stats_low.fer_frames > 100


def _qam_ber_theory(order: int, var_dim: float) -> float:
    """Gray M-QAM BER for per-dimension noise variance ``var_dim`` (unit Es)."""
    bps = int(math.log2(order))
    m_sq = int(math.sqrt(order))
    scale = math.sqrt(3.0 / (2.0 * (m_sq**2 - 1)))  # qam_spec axis scale
    q = _q(scale / math.sqrt(var_dim))  # nearest-neighbour distance 2*scale
    if order == 4:
        return q
    return (4.0 / bps) * (1.0 - 1.0 / m_sq) * q


def test_qam_mode3_uncoded_ber_matches_theory():
    """Barrage jamming (mode 3) on QAM is AWGN with effective per-dimension
    variance (sigma1^2 + p^2 sigma2^2)/bps -- the reference's y = s+n1+p*n2
    structure (channel.py:97-100) -- so uncoded BER must follow the standard
    Gray-QAM formula at that variance."""
    n, order = 120_000, 16
    bps = int(math.log2(order))
    chan = make_channel_fn(3, order, n=n)
    params = ChannelParams(
        mode=3, modulation=order, snr_db=9.0, interference_snr_db=6.0,
        p=0.3, speed=1.0, noise_model="exact",
    )
    consts = params.consts()
    key = jax.random.key(5)
    bits = jax.random.bernoulli(key, 0.5, (1, n)).astype(jnp.float32)
    llr = chan(jax.random.fold_in(key, 1), bits, consts)
    ber = float(jnp.mean((llr > 0) != (bits > 0.5)))

    var_dim = (params.sigma1**2 + params.p**2 * params.sigma2**2) / bps
    theory = _qam_ber_theory(order, var_dim)
    assert ber == pytest.approx(theory, rel=0.15), (ber, theory)


def test_qam_mode2_uncoded_ber_matches_mixture():
    """Partial-band jamming (mode 2) with the matched per-symbol demapper:
    uncoded BER must be the Bernoulli(p) mixture of the clean and jammed
    AWGN BERs (the jam state hits whole symbols, as in the reference's
    jam-state-aware L_c1/L_c2 selection, channel.py:88-95)."""
    n, order = 240_000, 16
    bps = int(math.log2(order))
    chan = make_channel_fn(2, order, n=n)
    params = ChannelParams(
        mode=2, modulation=order, snr_db=10.0, interference_snr_db=3.0,
        p=0.2, speed=1.0, noise_model="exact",
    )
    consts = params.consts()
    key = jax.random.key(6)
    bits = jax.random.bernoulli(key, 0.5, (1, n)).astype(jnp.float32)
    llr = chan(jax.random.fold_in(key, 1), bits, consts)
    ber = float(jnp.mean((llr > 0) != (bits > 0.5)))

    var1 = params.sigma1**2 / bps
    var2 = params.sigma2**2 / bps
    theory = (1.0 - params.p) * _qam_ber_theory(order, var1) + (
        params.p * _qam_ber_theory(order, var1 + var2)
    )
    assert ber == pytest.approx(theory, rel=0.15), (ber, theory)


def test_coded_16qam_mode2_end_to_end():
    """Coded smoke: 16-QAM under partial-band interference decodes cleanly
    when the jammer is weak/rare and fails when it is strong/frequent."""
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor, load_code

    code = load_code("builtin:wimax_576_0.5.alist.txt")
    opts = SimOptions(
        matrix=code.name, blocks=64, iterations=15, ber=True, fer=True,
        fidelity="exact", batch=64, seed=0, modulation=16, speed=0.5,
        mode=2, interference_snr=8.0, p=0.1, quiet=True,
    )
    ex = PointExecutor(code, opts)
    stats = ex.run_point(9.0, 64, jax.random.key(0), 0)
    assert stats.ok_blocks == 64

    stats_low = ex.run_point(0.0, 64, jax.random.key(0), 1)
    assert stats_low.fer_frames > 50


def test_qam_rejects_bad_length():
    with pytest.raises(ValueError, match="not divisible"):
        make_qam_modem(64, 100)


def test_qam_requires_exact_noise():
    from ldpc_tpu.ops.channel import make_channel
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor, load_code

    with pytest.raises(ValueError, match="exact"):
        make_channel(ChannelParams(modulation=16, noise_model="legacy"), n=96)
    code = load_code("builtin:wimax_576_0.5.alist.txt")
    with pytest.raises(ValueError, match="exact"):
        PointExecutor(code, SimOptions(matrix=code.name, blocks=8, ber=True,
                                       modulation=16, fidelity="reference"))


def test_unknown_modulation_rejected():
    with pytest.raises(ValueError, match="Unknown modulation"):
        make_channel_fn(1, 32, n=96)
