"""Two-phase straggler compaction (ldpc_tpu.ops.straggler).

The contract is BITWISE equality with single-pass full-budget decoding:
phase 2 re-decodes failures from scratch, replaying the exact trajectory a
single pass would have taken.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.models.code import LDPCCode
from ldpc_tpu.models.standards import wimax
from ldpc_tpu.ops.channel import ChannelParams, make_channel_fn
from ldpc_tpu.ops.encode import make_encoder, random_info_bits
from ldpc_tpu.ops.spa import make_decoder
from ldpc_tpu.ops.straggler import make_straggler_decoder


@pytest.fixture(scope="module")
def code():
    return LDPCCode(alist=wimax(576, "1/2"), name="wimax_576_0.5")


@pytest.fixture(scope="module")
def noisy_llr(code):
    """A batch at a waterfall-ish point: some failures at the screen budget."""
    spec = code.standard_encode_spec
    enc = make_encoder(spec, "orig")
    chan = make_channel_fn(1, 1)
    key = jax.random.key(42)
    u = random_info_bits(key, 256, code.k)
    w = enc(u)
    consts = ChannelParams(snr_db=2.0, speed=0.5, noise_model="exact").consts()
    return chan(jax.random.fold_in(key, 1), w, consts)


def _build(code, iters):
    spec = code.standard_encode_spec
    return make_decoder(
        code.layout("orig"), spec.info_pos("orig"), iters, "spa", rule="exact"
    )


def _assert_bitwise_equal(a, b):
    assert np.array_equal(np.asarray(a.ok), np.asarray(b.ok))
    assert np.array_equal(np.asarray(a.est), np.asarray(b.est))
    assert np.array_equal(np.asarray(a.conv_iter), np.asarray(b.conv_iter))
    assert np.array_equal(np.asarray(a.norm_llr), np.asarray(b.norm_llr))


def test_straggler_bitwise_equals_single_pass(code, noisy_llr):
    single = jax.jit(_build(code, 30))(noisy_llr)
    two_phase = jax.jit(
        make_straggler_decoder(_build(code, 10), _build(code, 30), capacity=64)
    )(noisy_llr)

    # the screen must leave real work (else the test proves nothing)
    screened = jax.jit(_build(code, 10))(noisy_llr)
    n_fail = int(jnp.sum(~screened.ok))
    assert 0 < n_fail <= 64, f"fixture degenerate: {n_fail} screen failures"

    _assert_bitwise_equal(two_phase, single)


def test_straggler_overflow_falls_back(code, noisy_llr):
    """capacity smaller than the failure count -> full-batch fallback, still
    bit-exact."""
    screened = jax.jit(_build(code, 2))(noisy_llr)
    n_fail = int(jnp.sum(~screened.ok))
    cap = max(1, n_fail // 4)
    two_phase = jax.jit(
        make_straggler_decoder(_build(code, 2), _build(code, 20), capacity=cap)
    )(noisy_llr)
    single = jax.jit(_build(code, 20))(noisy_llr)
    _assert_bitwise_equal(two_phase, single)


def test_runner_uses_straggler(code):
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor

    opts = SimOptions(
        matrix=code.name, blocks=1024, iterations=20, ber=True, fer=True,
        fidelity="exact", batch=1024, straggler="on", screen_iters=5,
    )
    ex = PointExecutor(code, opts)
    assert ex.kernel_used.endswith("+straggler")

    off = SimOptions(
        matrix=code.name, blocks=1024, iterations=20, ber=True, fer=True,
        fidelity="exact", batch=1024, straggler="off",
    )
    ex_off = PointExecutor(code, off)
    assert not ex_off.kernel_used.endswith("+straggler")

    # point results identical with and without compaction
    stats_on = ex.run_point(2.0, 1024, jax.random.key(0), 0)
    stats_off = ex_off.run_point(2.0, 1024, jax.random.key(0), 0)
    assert stats_on.error_bits == stats_off.error_bits
    assert stats_on.fer_frames == stats_off.fer_frames
    assert stats_on.conv_iters_sum == stats_off.conv_iters_sum
