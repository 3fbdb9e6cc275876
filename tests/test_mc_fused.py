"""Fused Monte-Carlo kernel (ldpc_tpu.ops.mc_pallas).

Strategy: the kernel's 'input' noise source takes a pre-drawn uint32 word
stream and (with debug_llr) exposes the exact in-kernel LLR bits. Feeding
THOSE LLRs to the UNFUSED Pallas decoder must reproduce the fused kernel's
counters bit-for-bit -- that pins the in-kernel decode and metric math to
the already-validated unfused path. The channel math itself is checked
against an eager jnp replay (channel_llr_reference) to ~1 ulp: inside the
kernel program XLA contracts mul+add chains into FMAs, so eager and
in-kernel LLRs are equal only to rounding, which is why the decode
comparison consumes the kernel's own bits. (The hardware PRNG source
differs only in where the words come from; it is exercised on TPU by the
bench and integration runs.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.models.code import LDPCCode
from ldpc_tpu.models.standards import ccsds, wimax
from ldpc_tpu.ops.channel import ChannelParams
from ldpc_tpu.ops.encode import make_encoder, make_encoder_T, random_info_bits
from ldpc_tpu.ops.mc_pallas import (
    DRAWS_PER_BIT,
    box_muller,
    channel_llr_reference,
    consts_vector,
    make_mc_decoder,
    mc_kernel_fits,
)
from ldpc_tpu.ops.spa_pallas import make_qc_decoder


@pytest.fixture(scope="module")
def wimax_code():
    return LDPCCode(alist=wimax(576, "1/2"), name="wimax_576_0.5")


def test_encoder_T_matches_encoder(wimax_code):
    code = wimax_code
    spec = code.standard_encode_spec
    u = random_info_bits(jax.random.key(0), 64, code.k)
    w = np.asarray(make_encoder(spec, "orig")(u))
    wT = np.asarray(make_encoder_T(spec, "orig")(u))
    assert np.array_equal(w, wT.T)


def test_box_muller_statistics():
    raw = jax.random.bits(jax.random.key(1), (3, 200_000), jnp.uint32)
    z = np.asarray(box_muller(raw[0], raw[1], raw[2]))
    assert abs(z.mean()) < 0.01
    assert abs(z.std() - 1.0) < 0.01
    assert np.isfinite(z).all()
    # 48-bit-deep radial uniform: magnitude capped at sqrt(-2 ln 2^-49)
    assert np.abs(z).max() < 8.25


def test_box_muller_tail_depth():
    """The 48-bit radial uniform reaches beyond the old 5.77-sigma cap:
    the all-zero draw (u1 = 2^-49, angle ~ 0) must produce ~8.24 sigma,
    and low words must matter when the high word is zero (regression for
    the round-2 24-bit scheme whose tail stopped at 5.77)."""
    zero = jnp.zeros((4,), jnp.uint32)
    z_deep = np.asarray(box_muller(zero, zero, zero))
    np.testing.assert_allclose(z_deep, np.sqrt(-2 * np.log(2.0**-49)),
                               rtol=1e-5)
    assert (z_deep > 8.2).all()
    # hi word zero, lo word large: magnitude ~ sqrt(-2 ln 2^-24) ~ 5.77
    lo_full = jnp.full((4,), 0xFFFFFFFF, jnp.uint32)
    z_mid = np.asarray(box_muller(zero, lo_full, zero))
    np.testing.assert_allclose(z_mid, np.sqrt(-2 * np.log(2.0**-24)),
                               rtol=1e-4)
    # the near-one rounding corner clamps below 1.0 (no log(1)=0 spike):
    hi_full = jnp.full((4,), 0xFFFFFFFF, jnp.uint32)
    z_top = np.asarray(box_muller(hi_full, lo_full, zero))
    assert np.isfinite(z_top).all() and (np.abs(z_top) > 0).all()


def test_box_muller2_statistics_and_independence():
    from ldpc_tpu.ops.mc_pallas import box_muller2

    raw = jax.random.bits(jax.random.key(2), (3, 200_000), jnp.uint32)
    za, zb = (np.asarray(v) for v in box_muller2(raw[0], raw[1], raw[2]))
    for z in (za, zb):
        assert abs(z.mean()) < 0.01
        assert abs(z.std() - 1.0) < 0.01
        assert np.isfinite(z).all()
    # cos/sin branches of one draw pair are exactly uncorrelated normals
    assert abs(np.corrcoef(za, zb)[0, 1]) < 0.01
    # cosine branch must equal the single-normal helper (shared draw path)
    np.testing.assert_array_equal(
        za, np.asarray(box_muller(raw[0], raw[1], raw[2]))
    )


# interpret-mode Pallas decodes on CPU take minutes per case -- excluded
# from the fast suite (pytest -m "not slow")
slow = pytest.mark.slow


def _fused_vs_unfused(code, mode, modulation, snr_db, B=128, iters=8,
                      schedule="flooding", variant="spa", alpha=0.75):
    spec = code.standard_encode_spec
    info_pos = spec.info_pos("orig")
    key = jax.random.key(42 + mode)
    u = random_info_bits(key, B, code.k)
    wT = make_encoder_T(spec, "orig")(u)
    draws = DRAWS_PER_BIT[mode]
    raw = jax.random.bits(jax.random.fold_in(key, 1), (draws, code.n, B),
                          jnp.uint32)
    params = ChannelParams(mode=mode, modulation=modulation, snr_db=snr_db,
                           speed=0.5, interference_snr_db=6.0, p=0.1,
                           noise_model="exact")
    consts = params.consts()

    mc = make_mc_decoder(code.qc, info_pos, iters, variant, mode=mode,
                         modulation=modulation, schedule=schedule, alpha=alpha,
                         noise_source="input", interpret=True, debug_llr=True)
    err, ok, conv, norm, it_l, dllr = jax.jit(mc)(
        wT, consts_vector(consts), jnp.zeros(2, jnp.int32), raw
    )

    # the kernel's channel math compiles with FMA contraction, so an eager
    # host replay agrees only to ~1 ulp -- check it within a tight relative
    # tolerance (channel_llr_reference returns the pre-negation convention)
    replay = -channel_llr_reference(wT, raw, consts, mode, modulation,
                                    code.qc.Z)
    np.testing.assert_allclose(np.asarray(dllr), np.asarray(replay),
                               rtol=1e-5, atol=1e-4)

    # decode + counter bit-identity: feed the EXACT in-kernel LLR bits to
    # the standalone Pallas decoder (double negation is IEEE-exact)
    dec = jax.jit(make_qc_decoder(code.qc, info_pos, iters, variant,
                                  schedule=schedule, alpha=alpha,
                                  interpret=True))
    res = dec(-dllr.T)

    assert np.array_equal(np.asarray(res.ok), np.asarray(ok))
    assert np.array_equal(np.asarray(res.conv_iter), np.asarray(conv))
    np.testing.assert_array_equal(np.asarray(res.norm_llr), np.asarray(norm))
    est_info = np.asarray(res.est)[:, np.asarray(info_pos)]
    expected_err = (est_info != np.asarray(u)).sum(axis=1)
    assert np.array_equal(expected_err, np.asarray(err))
    return np.asarray(ok)


@slow
def test_fused_mode1_bpsk_bit_identical(wimax_code):
    ok = _fused_vs_unfused(wimax_code, mode=1, modulation=1, snr_db=2.0)
    assert 0.5 < ok.mean() <= 1.0  # waterfall point: the decode is non-trivial


@slow
def test_fused_mode1_layered_bit_identical(wimax_code):
    ok = _fused_vs_unfused(wimax_code, mode=1, modulation=1, snr_db=2.0,
                           schedule="layered")
    assert 0.5 < ok.mean() <= 1.0


@slow
def test_fused_layered_alpha_schedule_bit_identical(wimax_code):
    """Per-iteration normalized-min-sum weights inside the fused kernel."""
    ok = _fused_vs_unfused(
        wimax_code, mode=1, modulation=1, snr_db=2.0, schedule="layered",
        variant="normalized_minsum",
        alpha=(0.64, 0.73, 0.78, 0.8, 0.8125, 0.82, 0.82, 0.82),
    )
    assert 0.5 < ok.mean() <= 1.0


@slow
def test_fused_mode2_bit_identical():
    code = LDPCCode(alist=ccsds(128), name="ccsds_128")
    _fused_vs_unfused(code, mode=2, modulation=1, snr_db=6.0, B=128, iters=6)


@slow
def test_fused_mode3_qpsk_bit_identical():
    code = LDPCCode(alist=ccsds(128), name="ccsds_128")
    _fused_vs_unfused(code, mode=3, modulation=2, snr_db=8.0, B=128, iters=6)


@slow
def test_fused_track_norm_off_identical(wimax_code):
    """Same injected draw stream through track_norm on/off fused kernels:
    err/ok/conv/iters bit-identical, norm zeros (the bench configuration
    elides the normalized-LLR bookkeeping)."""
    code = wimax_code
    spec = code.standard_encode_spec
    info_pos = spec.info_pos("orig")
    B, iters = 128, 6
    key = jax.random.key(7)
    u = random_info_bits(key, B, code.k)
    wT = make_encoder_T(spec, "orig")(u)
    raw = jax.random.bits(jax.random.fold_in(key, 1),
                          (DRAWS_PER_BIT[1], code.n, B), jnp.uint32)
    params = ChannelParams(mode=1, modulation=1, snr_db=2.0, speed=0.5,
                           noise_model="exact")
    cv = consts_vector(params.consts())
    seeds = jnp.zeros(2, jnp.int32)

    def run(track_norm):
        mc = make_mc_decoder(code.qc, info_pos, iters, "spa", mode=1,
                             schedule="layered", noise_source="input",
                             interpret=True, track_norm=track_norm)
        return jax.jit(mc)(wT, cv, seeds, raw)

    err1, ok1, conv1, norm1, it1 = run(True)
    err2, ok2, conv2, norm2, it2 = run(False)
    assert np.array_equal(np.asarray(err1), np.asarray(err2))
    assert np.array_equal(np.asarray(ok1), np.asarray(ok2))
    assert np.array_equal(np.asarray(conv1), np.asarray(conv2))
    assert np.array_equal(np.asarray(it1), np.asarray(it2))
    assert (np.asarray(norm2) == 0).all()
    assert np.asarray(norm1).any()  # the on-path really measured something


def test_mc_kernel_fits_whole_builtin_family():
    """Every QC code in the database fits the fused kernel's VMEM plan with
    the hardware noise source (the production configuration)."""
    from ldpc_tpu.models.standards import builtin_names, make_builtin
    from ldpc_tpu.models.qc import detect_qc

    checked = 0
    for name in builtin_names():
        qc = detect_qc(make_builtin(name))
        if qc is None:
            continue
        checked += 1
        for schedule in ("flooding", "layered"):
            assert mc_kernel_fits(qc, schedule, noise_source="hw"), (
                name, schedule)
    assert checked > 100  # the database is essentially all QC


@slow
class TestRunnerFusedPath:
    def _opts(self, **kw):
        from ldpc_tpu.sim.config import SimOptions

        base = dict(
            matrix="wimax_576_0.5", blocks=256, iterations=8, ber=True,
            fer=True, fidelity="exact", batch=256, seed=3, fused="on",
        )
        base.update(kw)
        return SimOptions(**base)

    def test_fused_runner_deterministic_and_sane(self, wimax_code):
        from ldpc_tpu.sim.runner import PointExecutor

        ex = PointExecutor(wimax_code, self._opts())
        assert ex.kernel_used.startswith("pallas+fused")
        s1 = ex.run_point(2.5, 256, jax.random.key(5), 0)
        s2 = ex.run_point(2.5, 256, jax.random.key(5), 0)
        assert (s1.blocks, s1.ok_blocks, s1.error_bits, s1.fer_frames) == (
            s2.blocks, s2.ok_blocks, s2.error_bits, s2.fer_frames)
        assert s1.blocks == 256
        assert s1.ok_blocks > 200  # 2.5 dB: most frames decode

    def test_fused_matches_unfused_statistically(self, wimax_code):
        from ldpc_tpu.sim.runner import PointExecutor

        fer = {}
        for fused in ("on", "off"):
            ex = PointExecutor(wimax_code, self._opts(fused=fused, blocks=512,
                                                      batch=512))
            s = ex.run_point(3.0, 512, jax.random.key(9), 0)
            fer[fused] = s.fer_frames / s.blocks
        # independent noise streams -- compare within generous MC tolerance
        assert abs(fer["on"] - fer["off"]) < 0.05, fer

    def test_chunked_dispatch_matches_single_steps(self, wimax_code):
        """run_point's scan-of-N dispatch groups must produce the same
        counters as the per-batch stream (identical key folding)."""
        from ldpc_tpu.sim.runner import PointExecutor

        opts = self._opts(blocks=512, batch=128, iterations=6)
        ex = PointExecutor(wimax_code, opts)
        assert hasattr(ex, "_chunk")
        chunked = ex.run_point(2.5, 512, jax.random.key(11), 0)

        ex2 = PointExecutor(wimax_code, opts)
        ex2._chunk = None  # force the single-step path
        single = ex2.run_point(2.5, 512, jax.random.key(11), 0)
        assert (chunked.blocks, chunked.ok_blocks, chunked.error_bits,
                chunked.fer_frames, chunked.conv_iters_sum,
                chunked.conv_count) == (
            single.blocks, single.ok_blocks, single.error_bits,
            single.fer_frames, single.conv_iters_sum, single.conv_count)
        assert abs(chunked.norm_llr_sum - single.norm_llr_sum) < 1e-4

    def test_fused_under_mesh_bit_identical(self, wimax_code):
        """The shard_map-wrapped fused kernel on the 8-device mesh must
        reproduce the unmeshed fused counters bit-for-bit: with the 'input'
        noise source every shard consumes its slice of the SAME global draw
        tensor, and the info-bit PRNG is partitionable."""
        from ldpc_tpu.parallel.mesh import make_mesh
        from ldpc_tpu.sim.runner import PointExecutor

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        opts = self._opts(blocks=256, batch=256, iterations=6)
        plain = PointExecutor(wimax_code, opts)
        meshed = PointExecutor(wimax_code, opts,
                               mesh=make_mesh({"batch": 8}))
        assert meshed.kernel_used == plain.kernel_used + "+mesh"
        a = plain.run_point(2.5, 256, jax.random.key(7), 0)
        b = meshed.run_point(2.5, 256, jax.random.key(7), 0)
        assert (a.blocks, a.ok_blocks, a.error_bits, a.fer_frames,
                a.conv_iters_sum, a.conv_count) == (
            b.blocks, b.ok_blocks, b.error_bits, b.fer_frames,
            b.conv_iters_sum, b.conv_count)
        assert abs(a.norm_llr_sum - b.norm_llr_sum) < 1e-6

    def test_fused_stays_off_for_vmapped_step(self, wimax_code):
        """The parallel sweep vmaps the step, which the shard_map wrapper
        does not support -- the executor must fall back to the unfused
        pipeline there instead of failing inside vmap."""
        from ldpc_tpu.parallel.mesh import make_mesh
        from ldpc_tpu.sim.runner import PointExecutor

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        ex = PointExecutor(
            wimax_code, self._opts(fused="auto"),
            mesh=make_mesh({"batch": 8}), step_vmapped=True,
        )
        assert not ex.kernel_used.startswith("pallas+fused")

    def test_kernel_xla_beats_fused_auto(self, wimax_code):
        """--kernel xla must win over fused auto-selection (review fix)."""
        from ldpc_tpu.sim.runner import PointExecutor

        ex = PointExecutor(wimax_code, self._opts(fused="auto", kernel="xla"))
        assert not ex.kernel_used.startswith("pallas+fused")
        assert ex.kernel_used.startswith("xla")

    def test_fused_on_rejects_ineligible(self, wimax_code):
        from ldpc_tpu.sim.runner import PointExecutor

        with pytest.raises(ValueError, match="fused"):
            PointExecutor(wimax_code, self._opts(interleaver="random"))
