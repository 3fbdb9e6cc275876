"""Decoder tests: numerical parity vs the float64 numpy reference SPA,
functional decoding power, early termination, variants, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.models.code import LDPCCode
from ldpc_tpu.models.generate import hamming_7_4
from ldpc_tpu.ops.spa import make_decoder

from reference_spa import decode_reference


@pytest.fixture(scope="module")
def hamming():
    return LDPCCode(alist=hamming_7_4(), name="hamming74")


def _random_llrs(code, batch, seed, scale=4.0):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, 2, (batch, code.k), dtype=np.uint8)
    w = code.standard_encode_spec.encode_numpy(u, "std").astype(np.float64)
    noise = rng.normal(0, 0.8, w.shape)
    llr = scale * ((2.0 * w - 1.0) + noise)
    return u, llr


@pytest.mark.parametrize("rule", ["legacy", "exact"])
@pytest.mark.parametrize("graph", ["std", "orig"])
def test_numerical_parity_with_reference(small_code, rule, graph):
    """float64 jnp decoder must reproduce the numpy reference decoder exactly
    (same hard decisions, convergence iterations, and normalized-LLR)."""
    code = small_code
    layout = code.layout(graph)
    info_pos = code.standard_encode_spec.info_pos(graph)
    B, iters = 24, 8
    _, llr = _random_llrs(code, B, seed=42)

    decode = make_decoder(
        layout, info_pos, iters, "spa", rule=rule, dtype=jnp.float64
    )
    res = decode(jnp.asarray(llr))

    for b in range(B):
        ok, est, conv, norm = decode_reference(
            layout, info_pos, llr[b], iters, rule=rule
        )
        assert bool(res.ok[b]) == ok, b
        assert int(res.conv_iter[b]) == conv, b
        assert np.array_equal(np.asarray(res.est[b]), est), b
        assert float(res.norm_llr[b]) == pytest.approx(norm, abs=1e-12), b


def test_f32_close_to_f64(small_code):
    code = small_code
    layout = code.layout("orig")
    info_pos = code.standard_encode_spec.info_pos("orig")
    _, llr = _random_llrs(code, 32, seed=7)
    d64 = make_decoder(layout, info_pos, 10, "spa", rule="exact", dtype=jnp.float64)
    d32 = make_decoder(layout, info_pos, 10, "spa", rule="exact", dtype=jnp.float32)
    r64 = d64(jnp.asarray(llr))
    r32 = d32(jnp.asarray(llr, jnp.float32))
    # hard decisions agree on the overwhelming majority of bits
    agree = np.mean(np.asarray(r64.est) == np.asarray(r32.est))
    assert agree > 0.995
    assert np.mean(np.asarray(r64.ok) == np.asarray(r32.ok)) > 0.95


def test_decodes_clean_llrs_first_iteration(small_code):
    """Noise-free LLRs must converge at iteration 0 with the exact rule."""
    code = small_code
    spec = code.standard_encode_spec
    u = np.random.default_rng(0).integers(0, 2, (8, code.k), dtype=np.uint8)
    w = spec.encode_numpy(u, "orig").astype(np.float32)
    llr = 8.0 * (2.0 * w - 1.0)
    decode = make_decoder(code.layout("orig"), spec.info_pos("orig"), 5, "spa", rule="exact")
    res = decode(jnp.asarray(llr))
    assert bool(jnp.all(res.ok))
    assert (np.asarray(res.conv_iter) == 0).all()
    assert np.array_equal(np.asarray(res.est), w.astype(np.uint8))


def test_exact_rule_corrects_errors(small_code):
    """Moderate AWGN at 3 dB: the exact-rule SPA on the sparse graph must
    decode essentially all frames of the rate-1/2 length-48 code."""
    code = small_code
    spec = code.standard_encode_spec
    rng = np.random.default_rng(5)
    B = 64
    u = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    w = spec.encode_numpy(u, "orig").astype(np.float64)
    sigma = 1.0 / np.sqrt(2.0 * 10 ** 0.3)
    y = (2.0 * w - 1.0) + rng.normal(0, sigma, w.shape)
    llr = 2.0 * y / sigma**2
    decode = make_decoder(code.layout("orig"), spec.info_pos("orig"), 30, "spa", rule="exact")
    res = decode(jnp.asarray(llr, jnp.float32))
    ok = np.asarray(res.ok)
    est = np.asarray(res.est)
    assert ok.mean() > 0.85
    # decoded-ok frames carry the transmitted word (no undetected errors here)
    assert np.array_equal(est[ok], w[ok].astype(np.uint8))


@pytest.mark.parametrize("variant", ["minsum", "normalized_minsum", "offset_minsum"])
def test_minsum_variants_decode(small_code, variant):
    code = small_code
    spec = code.standard_encode_spec
    rng = np.random.default_rng(6)
    B = 48
    u = rng.integers(0, 2, (B, code.k), dtype=np.uint8)
    w = spec.encode_numpy(u, "orig").astype(np.float64)
    sigma = 1.0 / np.sqrt(2.0 * 10 ** 0.4)  # 4 dB
    llr = 2.0 * ((2 * w - 1) + rng.normal(0, sigma, w.shape)) / sigma**2
    decode = make_decoder(
        code.layout("orig"), spec.info_pos("orig"), 30, variant, rule="exact"
    )
    res = decode(jnp.asarray(llr, jnp.float32))
    assert np.asarray(res.ok).mean() > 0.8


def test_minsum_checknode_exactness(small_code):
    """Min-sum check update: E_i = prod(sign_j != i) * min(|M_j|, j != i)."""
    code = small_code
    layout = code.layout("orig")
    info = code.standard_encode_spec.info_pos("orig")
    rng = np.random.default_rng(8)
    llr = rng.normal(0, 2, (4, code.n))
    d = make_decoder(layout, info, 1, "minsum", rule="exact", dtype=jnp.float64)
    res = d(jnp.asarray(llr))
    # brute-force one iteration posterior
    n, m = layout.n, layout.m
    for b in range(2):
        L = -llr[b].copy()  # exact rule negates into log(p0/p1)
        for c in range(m):
            vars_c = [v for v in layout.chk_var[c] if v < n]
            msgs = np.array([-llr[b][v] for v in vars_c])
            for i, v in enumerate(vars_c):
                others = np.delete(msgs, i)
                e = np.prod(np.sign(others)) * np.min(np.abs(others))
                L[v] += e
        est = (L < 0).astype(np.uint8)
        assert np.array_equal(np.asarray(res.est[b]), est)


def test_bitflipping_corrects_single_error(hamming):
    spec = hamming.standard_encode_spec
    u = np.array([[1, 0, 1, 1]], dtype=np.uint8)
    w = spec.encode_numpy(u, "orig").astype(np.float32)
    llr = 5.0 * (2 * w - 1)
    llr[0, 2] *= -1.0  # flip one bit's channel evidence
    decode = make_decoder(hamming.layout("orig"), spec.info_pos("orig"), 10, "bitflipping")
    res = decode(jnp.asarray(llr))
    assert bool(res.ok[0])
    assert np.array_equal(np.asarray(res.est[0]), w[0].astype(np.uint8))


def test_early_exit_iteration_counts(small_code):
    """iters_run must not exceed max_iterations and must stop early when the
    whole batch converges immediately."""
    code = small_code
    spec = code.standard_encode_spec
    u = np.zeros((4, code.k), dtype=np.uint8)
    w = spec.encode_numpy(u, "orig").astype(np.float32)
    llr = 10.0 * (2 * w - 1)
    decode = make_decoder(code.layout("orig"), spec.info_pos("orig"), 50, "spa", rule="exact")
    res = decode(jnp.asarray(llr))
    assert int(res.iters_run) == 1  # converges at iteration 0, loop exits


def test_failed_frames_report_minus_one(small_code):
    code = small_code
    rng = np.random.default_rng(9)
    llr = rng.normal(0, 1.0, (16, code.n)).astype(np.float32)  # garbage channel
    decode = make_decoder(
        code.layout("orig"), code.standard_encode_spec.info_pos("orig"), 3, "spa",
        rule="exact",
    )
    res = decode(jnp.asarray(llr))
    ok = np.asarray(res.ok)
    conv = np.asarray(res.conv_iter)
    assert (conv[~ok] == -1).all()
    assert (conv[ok] >= 0).all()


def test_determinism(small_code):
    code = small_code
    _, llr = _random_llrs(code, 8, seed=3)
    decode = make_decoder(
        code.layout("orig"), code.standard_encode_spec.info_pos("orig"), 8, "spa",
        rule="exact",
    )
    r1 = decode(jnp.asarray(llr, jnp.float32))
    r2 = decode(jnp.asarray(llr, jnp.float32))
    assert np.array_equal(np.asarray(r1.est), np.asarray(r2.est))
    assert np.array_equal(np.asarray(r1.conv_iter), np.asarray(r2.conv_iter))


def test_minsum_degree_one_check_stays_finite():
    """A weight-1 check row must not poison min-sum with inf - inf = NaN."""
    import numpy as np

    from ldpc_tpu.models.alist import AlistMatrix
    from ldpc_tpu.models.code import build_edge_layout
    from ldpc_tpu.ops.spa import make_decoder

    H = np.array([[1, 1, 0, 1, 0], [0, 1, 1, 0, 1], [0, 0, 0, 0, 1]], np.uint8)
    rows, cols = np.nonzero(H)
    layout = build_edge_layout(5, 3, rows.astype(np.int32), cols.astype(np.int32))
    dec = jax.jit(make_decoder(layout, np.arange(2, dtype=np.int32), 8,
                               "normalized_minsum", rule="exact"))
    llr = jnp.asarray([[-4.0, 3.0, -2.0, -5.0, -1.0]], jnp.float32)
    r = dec(llr)
    assert np.isfinite(np.asarray(r.norm_llr)).all()
    assert np.asarray(r.est).max() <= 1  # decoded bits are bits, not NaN junk


def test_skip_exits_before_first_iteration(small_code):
    """decode(llr, skip=True) must run zero iterations (the hook a vmapped
    SNR sweep uses to stop paying for points that reached their error
    quota); skip=False must match a plain call exactly."""
    from ldpc_tpu.ops.layered import make_qc_layered_decoder

    _, llr = _random_llrs(small_code, 16, seed=3)
    llr = jnp.asarray(llr, jnp.float32)
    layout = small_code.layout("orig")
    info_pos = small_code.standard_encode_spec.info_pos("orig")

    dec = make_decoder(layout, info_pos, 8, "spa", rule="exact")
    skipped = dec(llr, skip=jnp.bool_(True))
    assert int(skipped.iters_run) == 0
    assert bool(jnp.all(skipped.ok))  # pre-marked done; caller discards
    plain = dec(llr)
    unskipped = dec(llr, skip=jnp.bool_(False))
    assert bool(jnp.all(plain.est == unskipped.est))
    assert int(plain.iters_run) == int(unskipped.iters_run)

    qc = small_code.qc
    if qc is not None:
        ldec = make_qc_layered_decoder(qc, info_pos, 8, "spa")
        lskip = ldec(llr, skip=jnp.bool_(True))
        assert int(lskip.iters_run) == 0
        lplain = ldec(llr)
        lun = ldec(llr, skip=jnp.bool_(False))
        assert bool(jnp.all(lplain.est == lun.est))
