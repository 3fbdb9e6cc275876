"""Interleaver tests: inversion, reference semantics, spread constraint."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.ops.interleave import (
    make_interleaver,
    regular_dims,
    regular_permutation,
    srandom_permutation,
)


@pytest.mark.parametrize("kind", ["none", "regular", "random", "srandom"])
def test_roundtrip_positions(kind):
    """deinterleave(channel(interleave(bits))) must restore per-position
    pairing: llr position i must correspond to bits position i."""
    n, B = 36, 5
    interleave, deinterleave = make_interleaver(kind, n, s_param=3, seed=1)
    bits = jnp.asarray(np.random.default_rng(0).integers(0, 2, (B, n)), jnp.float32)
    key = jax.random.key(2)
    out, state = interleave(key, bits)
    # the "channel" just passes symbols through: llr_i = 2*bit_i - 1
    llr = 2.0 * out - 1.0
    restored = deinterleave(state, llr)
    assert np.array_equal(np.asarray(restored), np.asarray(2.0 * bits - 1.0))


def test_regular_dims():
    assert regular_dims(36) == (6, 6)
    assert regular_dims(48) == (6, 8)
    assert regular_dims(7) == (1, 7)  # prime: degenerate row
    assert regular_dims(576) == (24, 24)


def test_regular_permutation_matches_reference_order():
    """new[col*rows + row] = old[row*cols + col] (data_buffer.py:477-488)."""
    n = 12  # rows=3, cols=4
    pi = regular_permutation(n)
    old = np.arange(n)
    new = old[pi]
    rows, cols = regular_dims(n)
    for r in range(rows):
        for c in range(cols):
            assert new[c * rows + r] == old[r * cols + c]


def test_regular_is_involution_free_roundtrip():
    n = 24
    interleave, deinterleave = make_interleaver("regular", n)
    bits = jnp.arange(n, dtype=jnp.float32)[None, :]
    out, st = interleave(jax.random.key(0), bits)
    assert not np.array_equal(np.asarray(out[0]), np.arange(n))  # actually permutes
    back = deinterleave(st, out)
    assert np.array_equal(np.asarray(back[0]), np.arange(n))


def test_random_differs_per_block_and_key():
    n, B = 64, 4
    interleave, _ = make_interleaver("random", n)
    bits = jnp.tile(jnp.arange(n, dtype=jnp.float32), (B, 1))
    out, pi = interleave(jax.random.key(0), bits)
    pi = np.asarray(pi)
    # rows are distinct permutations (overwhelmingly likely)
    assert not np.array_equal(pi[0], pi[1])
    for b in range(B):
        assert sorted(pi[b].tolist()) == list(range(n))
    out2, pi2 = interleave(jax.random.key(1), bits)
    assert not np.array_equal(np.asarray(pi2), pi)


@pytest.mark.parametrize("s", [2, 3, 4])
def test_srandom_spread_property(s):
    """Positions within s consecutive output slots are >= s apart."""
    n = 64
    pi = srandom_permutation(n, s, seed=3)
    assert sorted(pi.tolist()) == list(range(n))
    for i in range(n):
        for j in range(i + 1, min(i + s, n)):
            assert abs(int(pi[i]) - int(pi[j])) >= s, (i, j)


def test_srandom_actually_interleaves():
    """The reference's main pipeline silently no-ops SRANDOM
    (data_buffer.py:508-519); ours must actually permute."""
    n = 32
    interleave, _ = make_interleaver("srandom", n, s_param=2, seed=0)
    bits = jnp.arange(n, dtype=jnp.float32)[None, :]
    out, _ = interleave(jax.random.key(0), bits)
    assert not np.array_equal(np.asarray(out[0]), np.arange(n))


def test_unknown_kind_raises():
    with pytest.raises(ValueError):
        make_interleaver("bogus", 8)


def test_file_interleaver_roundtrip(tmp_path):
    """'file:<perm.npy>' -- bring-your-own static permutation (round 5;
    used by examples/burst_interleaver's adversarial control)."""
    n = 24
    rng = np.random.default_rng(5)
    pi = rng.permutation(n).astype(np.int32)
    p = tmp_path / "pi.npy"
    np.save(p, pi)
    interleave, deinterleave = make_interleaver(f"file:{p}", n)
    bits = jnp.arange(n, dtype=jnp.float32)[None, :]
    out, st = interleave(jax.random.key(0), bits)
    assert np.array_equal(np.asarray(out[0]), pi.astype(np.float32))
    back = deinterleave(st, out)
    assert np.array_equal(np.asarray(back[0]), np.arange(n, dtype=np.float32))


def test_file_interleaver_rejects_non_permutation(tmp_path):
    p = tmp_path / "bad.npy"
    np.save(p, np.zeros(8, np.int32))
    with pytest.raises(ValueError, match="not a permutation"):
        make_interleaver(f"file:{p}", 8)
