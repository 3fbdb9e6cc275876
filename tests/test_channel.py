"""Channel model tests: scale factors, noise statistics, calibration."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.ops.channel import ChannelParams, make_channel, make_channel_fn


def test_scale_factors_match_reference_formulas():
    """L_c and sigma formulas from channel.py:102-119."""
    p = ChannelParams(mode=2, speed=0.5, snr_db=3.0, interference_snr_db=1.5, p=0.2)
    sn1 = 10 ** 0.3
    sn2 = 10 ** 0.15
    assert p.l_c1 == pytest.approx(4 * 0.5 * sn1)
    assert p.l_c2 == pytest.approx(4 * 0.5 / (1 / sn1 + 1 / (sn2 * 0.2)))
    assert p.l_c3 == pytest.approx(
        4 * 0.2 * 0.5 / (2 / sn2) + 4 * 0.5 * 0.8 * sn1
    )
    assert p.sigma1 == pytest.approx(1 / math.sqrt(2 * 0.5 * sn1))
    assert p.sigma2 == pytest.approx(1 / math.sqrt(2 * 0.5 * sn2 * 0.2))
    p3 = ChannelParams(mode=3, speed=0.5, snr_db=3.0, interference_snr_db=1.5, p=0.2)
    assert p3.sigma2 == pytest.approx(1 / math.sqrt(2 * 0.5 * sn2))


def test_legacy_noise_uses_sigma_squared_as_stddev():
    """The reference's deliberate bug (channel.py:55-68)."""
    params_legacy = ChannelParams(snr_db=0.0, noise_model="legacy")
    params_exact = ChannelParams(snr_db=0.0, noise_model="exact")
    sigma = params_exact.sigma1
    bits = jnp.zeros((200, 512), jnp.float32)
    key = jax.random.key(0)
    for params, expected_std in ((params_legacy, sigma**2), (params_exact, sigma)):
        llr = make_channel(params)(key, bits)
        # llr = scale * (-1 + noise) => noise = llr/scale + 1
        noise = np.asarray(llr) * sigma**2 / 2.0 + 1.0
        assert noise.std() == pytest.approx(expected_std, rel=0.02)
        assert abs(noise.mean()) < 3 * expected_std / math.sqrt(noise.size)


def test_mode1_llr_scale_and_sign():
    params = ChannelParams(snr_db=10.0, noise_model="exact")  # low noise
    bits = jnp.asarray(np.tile([0.0, 1.0], 256)[None, :], jnp.float32)
    llr = np.asarray(make_channel(params)(jax.random.key(1), bits))
    # high SNR: sign of llr follows the bit (+ for 1, - for 0)
    signs = np.sign(llr[0])
    expect = np.tile([-1.0, 1.0], 256)
    assert (signs == expect).mean() > 0.999
    # magnitude ~ 2/sigma^2 at the symbol
    assert np.median(np.abs(llr)) == pytest.approx(2 / params.sigma1**2, rel=0.1)


def test_qpsk_amplitude():
    params = ChannelParams(snr_db=20.0, modulation=2, noise_model="exact")
    bits = jnp.ones((1, 4096), jnp.float32)
    llr = np.asarray(make_channel(params)(jax.random.key(2), bits))
    # llr ~ scale * 0.7
    assert llr.mean() == pytest.approx(2 / params.sigma1**2 * 0.7, rel=0.05)


def test_mode2_mixture_fraction():
    params = ChannelParams(mode=2, snr_db=2.0, interference_snr_db=0.0, p=0.3)
    consts = params.consts()
    fn = make_channel_fn(2, 1)
    bits = jnp.ones((64, 1024), jnp.float32)
    llr = np.asarray(fn(jax.random.key(3), bits, consts))
    assert llr.shape == (64, 1024)
    assert np.isfinite(llr).all()
    # jammed bits are scaled by l_c2, clean by l_c1; both nonzero
    assert params.l_c1 != pytest.approx(params.l_c2)


def test_mode3_deterministic_mix_shape():
    params = ChannelParams(mode=3, snr_db=2.0, interference_snr_db=1.0, p=0.25)
    fn = make_channel_fn(3, 1)
    llr = np.asarray(fn(jax.random.key(4), jnp.zeros((8, 128), jnp.float32), params.consts()))
    assert llr.shape == (8, 128)
    assert np.isfinite(llr).all()


def test_uncoded_bpsk_ber_matches_q_function():
    """Physics calibration: exact-noise BPSK hard-decision BER == Q(sqrt(2*snr))."""
    from scipy.stats import norm

    snr_db = 4.0
    params = ChannelParams(snr_db=snr_db, noise_model="exact")
    rng = np.random.default_rng(0)
    bits_np = rng.integers(0, 2, (512, 2048)).astype(np.float32)
    llr = np.asarray(make_channel(params)(jax.random.key(5), jnp.asarray(bits_np)))
    est = (llr >= 0).astype(np.float32)
    ber = float(np.mean(est != bits_np))
    expect = float(norm.sf(math.sqrt(2 * 10 ** (snr_db / 10))))
    assert ber == pytest.approx(expect, rel=0.05)


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        make_channel_fn(4, 1)
