"""Learned min-sum weight schedules (ldpc_tpu.analysis.learned_minsum)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.analysis.learned_minsum import (
    evaluate_alphas,
    make_unrolled_minsum,
    train_alphas,
)
from ldpc_tpu.ops.channel import ChannelParams, make_channel_fn
from ldpc_tpu.ops.encode import make_encoder, random_info_bits
from ldpc_tpu.ops.spa import make_decoder
from ldpc_tpu.sim.runner import load_code

slow = pytest.mark.slow


@pytest.fixture(scope="module")
def wimax():
    return load_code("builtin:wimax_576_0.5.alist.txt")


def _llrs(code, B, snr_db=2.0, seed=0):
    key = jax.random.key(seed)
    k_u, k_ch = jax.random.split(key)
    u = random_info_bits(k_u, B, code.k)
    w = make_encoder(code.standard_encode_spec, "orig")(u)
    consts = ChannelParams(
        mode=1, modulation=1, speed=code.rate, snr_db=snr_db,
        noise_model="exact",
    ).consts()
    llr = make_channel_fn(1, 1, n=code.n)(k_ch, w, consts)
    return u, w, llr


def test_vector_alpha_constant_equals_scalar(wimax):
    """A constant per-iteration alpha vector must reproduce the scalar
    normalized-min-sum decoder bit-for-bit (regression for the vector-alpha
    path and the minsum_excl_update refactor)."""
    code = wimax
    info = code.standard_encode_spec.info_pos("orig")
    layout = code.layout("orig")
    _, _, llr = _llrs(code, 32)
    d_s = make_decoder(layout, info, 8, "normalized_minsum", alpha=0.8125)
    d_v = make_decoder(layout, info, 8, "normalized_minsum",
                       alpha=np.full(8, 0.8125))
    r1, r2 = d_s(llr), d_v(llr)
    assert np.array_equal(np.asarray(r1.est), np.asarray(r2.est))
    assert np.array_equal(np.asarray(r1.ok), np.asarray(r2.ok))
    assert np.array_equal(np.asarray(r1.conv_iter), np.asarray(r2.conv_iter))


def test_vector_alpha_requires_normalized_minsum(wimax):
    code = wimax
    info = code.standard_encode_spec.info_pos("orig")
    with pytest.raises(ValueError, match="normalized_minsum"):
        make_decoder(code.layout("orig"), info, 4, "minsum",
                     alpha=np.full(4, 0.8))


def test_unrolled_first_iteration_matches_decoder(wimax):
    """The differentiable unroll and the production decoder share one
    forward: iteration-1 posterior hard decisions must agree exactly."""
    code = wimax
    layout = code.layout("orig")
    info = code.standard_encode_spec.info_pos("orig")
    _, _, llr = _llrs(code, 32, seed=4)
    alphas = jnp.full((1,), 0.8125)
    Ls = make_unrolled_minsum(layout, 1)(alphas, llr)
    est_unrolled = (Ls[0] < 0).astype(np.uint8)
    d = make_decoder(layout, info, 1, "normalized_minsum", alpha=0.8125,
                     early_exit=False)
    res = d(llr)
    assert np.array_equal(np.asarray(est_unrolled), np.asarray(res.est))


@slow
def test_training_learns_useful_schedule(wimax):
    """Loss decreases, the schedule stays in-range, and the learned
    schedule's paired FER does not regress vs the default alpha=0.75."""
    code = wimax
    alphas, losses = train_alphas(
        code, 2.0, iters=5, steps=40, batch=64, lr=0.05, seed=0,
        say=lambda *a, **k: None,
    )
    assert alphas.shape == (5,)
    assert np.all((alphas > 0) & (alphas < 1.5))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    base = evaluate_alphas(code, 0.75, 2.0, iters=5, blocks=2048, batch=256)
    learned = evaluate_alphas(code, alphas, 2.0, iters=5, blocks=2048,
                              batch=256)
    assert base["frames"] == learned["frames"]
    assert learned["fer"] <= base["fer"]
