"""Metric accounting: reference BER/FER conventions, masking, reduction."""

import jax.numpy as jnp
import numpy as np

from ldpc_tpu.ops.metrics import (
    BlockCounters,
    block_stats,
    count_block_metrics,
    reduce_block_stats,
)
from ldpc_tpu.ops.spa import DecodeResult


def _mk_result(est, ok, conv, norm):
    return DecodeResult(
        ok=jnp.asarray(ok),
        est=jnp.asarray(est, jnp.uint8),
        conv_iter=jnp.asarray(conv, jnp.int32),
        norm_llr=jnp.asarray(norm, jnp.float32),
        iters_run=jnp.int32(5),
    )


def test_ber_counts_failed_frames_only():
    """Reference semantics (main.py:134): converged frames contribute 0."""
    u = jnp.asarray([[0, 0], [1, 1]], jnp.uint8)
    est = [[1, 0, 0], [0, 1, 1]]  # frame0: 1 info error; frame1: 1 info error
    res = _mk_result(est, [True, False], [2, -1], [0.0, 0.5])
    info_pos = jnp.asarray([0, 1])
    c = count_block_metrics(u, res, info_pos)
    assert int(c.error_bits) == 1  # only the failed frame's error counts
    assert int(c.fer_frames) == 1
    assert int(c.ok_blocks) == 1
    c_exact = count_block_metrics(u, res, info_pos, exact=True)
    assert int(c_exact.error_bits) == 2  # undetected error counted too


def test_convergence_accounting():
    u = jnp.zeros((3, 2), jnp.uint8)
    res = _mk_result(np.zeros((3, 4)), [True, True, False], [1, 3, -1], [0.1, 0.2, 0.3])
    c = count_block_metrics(u, res, jnp.asarray([0, 1]))
    assert int(c.conv_iters_sum) == 4
    assert int(c.conv_count) == 2
    assert float(c.norm_llr_sum) == np.float32(0.1) + np.float32(0.2) + np.float32(0.3)


def test_valid_masking():
    u = jnp.zeros((4, 2), jnp.uint8)
    est = np.ones((4, 4))
    res = _mk_result(est, [False] * 4, [-1] * 4, [1.0] * 4)
    stats = block_stats(u, res, jnp.asarray([0, 1]))
    c = reduce_block_stats(stats, jnp.asarray([True, True, False, False]))
    assert int(c.blocks) == 2
    assert int(c.error_bits) == 4
    assert int(c.fer_frames) == 2


def test_counters_add():
    a = BlockCounters(
        jnp.int32(1), jnp.int32(1), jnp.int32(2), jnp.int32(0),
        jnp.float32(0.5), jnp.int32(3), jnp.int32(1),
    )
    s = a + a
    assert int(s.blocks) == 2 and int(s.error_bits) == 4
    z = BlockCounters.zeros()
    s2 = z + a
    assert int(s2.conv_iters_sum) == 3
