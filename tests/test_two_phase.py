"""Two-phase fused dispatch (phase-1 short decode + compacted re-decode).

The claim that makes two-phase a pure dispatch knob: every decode op is
lane-wise, so a frame's trajectory is a deterministic function of its channel
LLR vector alone. Re-decoding an unconverged frame FROM SCRATCH with the full
iteration budget therefore replays its single-pass trajectory bit-for-bit --
the composition (short decode for all + full decode for the unconverged) must
equal the single-pass decode on every output. These tests pin that equality
through the runner's own composition logic (runner.resolve_two_phase +
mc_base) at the ops layer, using the injected-noise kernel in interpret mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.models.code import LDPCCode
from ldpc_tpu.models.standards import ccsds
from ldpc_tpu.ops.channel import ChannelParams
from ldpc_tpu.ops.encode import make_encoder_T, random_info_bits
from ldpc_tpu.ops.mc_pallas import (
    DRAWS_PER_BIT,
    consts_vector,
    make_llr_decoder,
    make_mc_decoder,
    mc_kernel_fits,
    mc_vmem_bytes,
)
from ldpc_tpu.sim.runner import resolve_two_phase

slow = pytest.mark.slow


def test_resolve_two_phase():
    assert resolve_two_phase("off", 12) == 0
    assert resolve_two_phase("auto", 12) == 6
    assert resolve_two_phase("auto", 7) == 0  # too small a budget to split
    assert resolve_two_phase("auto", 8) == 4
    assert resolve_two_phase("5", 12) == 5
    assert resolve_two_phase(5, 12) == 5
    with pytest.raises(ValueError):
        resolve_two_phase("12", 12)  # phase 1 must leave budget for phase 2
    with pytest.raises(ValueError):
        resolve_two_phase("-1", 12)
    with pytest.raises(ValueError):
        resolve_two_phase("banana", 12)


def test_cli_two_phase_flag():
    from ldpc_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["--matrix", "builtin:wimax_576_0.5.alist.txt", "--two-phase", "6"]
    )
    assert args.two_phase == "6"
    assert build_parser().parse_args(
        ["--matrix", "x"]
    ).two_phase == "auto"


def test_emit_llr_vmem_accounting():
    code = LDPCCode(alist=ccsds(128), name="ccsds_128")
    base = mc_vmem_bytes(code.qc)
    with_llr = mc_vmem_bytes(code.qc, emit_llr=True)
    # x2: I/O blocks are double-buffered across grid steps by the pallas
    # pipeline (accounting validated against the wifi_648 G=4 OOM)
    assert with_llr == base + 2 * 4 * 128 * code.n
    assert mc_kernel_fits(code.qc, emit_llr=True)


def _two_phase_vs_single(code, snr_db, *, iters=8, phase1=4, B=128,
                         schedule="flooding", variant="spa",
                         track_norm=True, mode=1):
    """Run the exact runner composition at the ops layer and compare."""
    spec = code.standard_encode_spec
    info_pos = spec.info_pos("orig")
    key = jax.random.key(11)
    u = random_info_bits(key, B, code.k)
    wT = make_encoder_T(spec, "orig")(u)
    raw = jax.random.bits(jax.random.fold_in(key, 1),
                          (DRAWS_PER_BIT[mode], code.n, B), jnp.uint32)
    params = ChannelParams(mode=mode, modulation=1, snr_db=snr_db,
                           speed=0.5, interference_snr_db=6.0, p=0.1,
                           noise_model="exact")
    cv = consts_vector(params.consts())
    seeds = jnp.zeros(2, jnp.int32)
    kw = dict(mode=mode, schedule=schedule, noise_source="input",
              interpret=True, track_norm=track_norm)

    # single-pass truth
    mc_full = make_mc_decoder(code.qc, info_pos, iters, variant, **kw)
    err0, ok0, conv0, norm0, _ = jax.jit(mc_full)(wT, cv, seeds, raw)

    # two-phase: the runner's mc_base composition, verbatim semantics
    mc1 = make_mc_decoder(code.qc, info_pos, phase1, variant,
                          emit_llr=True, **kw)
    llr_dec = make_llr_decoder(
        code.qc, info_pos, iters, variant, schedule=schedule,
        interpret=True, track_norm=track_norm,
    )

    def two_phase(wT, cv, seeds, raw):
        err1, ok1, conv1, norm1, it1, llrT = mc1(wT, cv, seeds, raw)
        order = jnp.argsort(ok1.astype(jnp.int32))
        err2, ok2, conv2, norm2, it2 = llr_dec(
            jnp.take(llrT, order, axis=1), jnp.take(wT, order, axis=1),
            ok1[order].astype(jnp.float32),
        )

        def unsort(x):
            return jnp.zeros_like(x).at[order].set(x)

        return (
            jnp.where(ok1, err1, unsort(err2)),
            ok1 | unsort(ok2),
            jnp.where(ok1, conv1, unsort(conv2)),
            jnp.where(ok1, norm1, unsort(norm2)),
        )

    err, ok, conv, norm = jax.jit(two_phase)(wT, cv, seeds, raw)
    p1_ok = np.asarray(jax.jit(mc1)(wT, cv, seeds, raw)[1])

    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok0))
    np.testing.assert_array_equal(np.asarray(err), np.asarray(err0))
    np.testing.assert_array_equal(np.asarray(conv), np.asarray(conv0))
    np.testing.assert_array_equal(np.asarray(norm), np.asarray(norm0))
    return np.asarray(ok0), p1_ok


@slow
def test_two_phase_bit_identical_flooding():
    code = LDPCCode(alist=ccsds(128), name="ccsds_128")
    ok, p1_ok = _two_phase_vs_single(code, snr_db=4.0)
    # the operating point must exercise BOTH phases: some frames converge in
    # phase 1, some only in phase 2, some never
    assert 0 < p1_ok.sum() and p1_ok.sum() < ok.sum()


@slow
def test_two_phase_bit_identical_layered_minsum():
    code = LDPCCode(alist=ccsds(128), name="ccsds_128")
    ok, p1_ok = _two_phase_vs_single(
        code, snr_db=4.0, schedule="layered", variant="normalized_minsum",
        iters=6, phase1=3, track_norm=False,
    )
    assert 0 < p1_ok.sum() < ok.sum()


def test_decide_two_phase_operating_point():
    """The probe decision: split off at FER~1, on in the waterfall."""
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor

    from ldpc_tpu.sim.runner import load_code

    # flagship-sized code: the overhead is ~2 sweeps of ITS tile time, so
    # the waterfall economics play out as on the bench point
    code = load_code("builtin:wimax_1152_0.5.alist.txt")
    ex = PointExecutor(code, SimOptions(
        matrix=code.name, blocks=4096, iterations=12, ber=True, fer=True,
        fidelity="exact", batch=4096, seed=0, fused="on", two_phase="auto",
    ))
    assert ex._phase1_auto == 6
    B, it = 4096, 12
    # FER ~ 1: nothing converges -> every tile re-decodes at full budget,
    # two-phase adds pure overhead -> must choose single-pass
    conv = np.full(B, -1, np.int32)
    ok = np.zeros(B, bool)
    assert ex._decide_two_phase(conv, ok) is False
    # waterfall regime (the bench point): most frames converge fast, but
    # one straggler per tile drags EVERY tile to the full budget -> phase 1
    # releases all tiles at 6 trips and re-decodes ~1/128 of lanes: a win
    # (single-pass 12 trips/tile vs ~6 + 12/32 + overhead)
    conv = np.full(B, 2, np.int32)
    conv[::128] = it - 1
    ok = np.ones(B, bool)
    assert ex._decide_two_phase(conv, ok) is True
    # fast-converging point: every tile exits at 4 trips on its own; the
    # split could only add its emit/sort overhead -> single-pass
    assert ex._decide_two_phase(
        np.full(B, 3, np.int32), np.ones(B, bool)
    ) is False
    # tiny probe (sub-tile) must not crash
    assert ex._decide_two_phase(
        np.full(64, -1, np.int32), np.zeros(64, bool)
    ) is False

    # SMALL code: the same dispatch overhead priced at its ~30x smaller
    # per-sweep tile time swamps any split gain -- auto must decline even
    # in the favorable straggler profile (the round-4 trip-unit constant
    # predicted a win here; it measured 22% slower on hardware,
    # examples/sublane_fill)
    small = LDPCCode(alist=ccsds(128), name="ccsds_128")
    ex2 = PointExecutor(small, SimOptions(
        matrix="ccsds_128", blocks=4096, iterations=12, ber=True, fer=True,
        fidelity="exact", batch=4096, seed=0, fused="on", two_phase="auto",
    ))
    assert ex2.TWO_PHASE_OVERHEAD_US / ex2._trip_time_us > it
    conv = np.full(B, 2, np.int32)
    conv[::128] = it - 1
    assert ex2._decide_two_phase(conv, np.ones(B, bool)) is False


@slow
def test_two_phase_auto_probe_counters_match():
    """'auto' (probe-gated) produces the same counters as 'off' regardless
    of which mode the probe picks, and kernel_used records the decision."""
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor

    code = LDPCCode(alist=ccsds(128), name="ccsds_128")
    base = dict(
        matrix="ccsds_128", blocks=512, iterations=8, ber=True, fer=True,
        fidelity="exact", batch=128, seed=3, fused="on",
    )
    ex_off = PointExecutor(code, SimOptions(two_phase="off", **base))
    ex_auto = PointExecutor(code, SimOptions(two_phase="auto", **base))
    assert "+2phase(auto)" in ex_auto.kernel_used
    for snr, snr_idx in ((4.0, 0), (0.0, 1)):
        a = ex_off.run_point(snr, 512, jax.random.key(3), snr_idx)
        b = ex_auto.run_point(snr, 512, jax.random.key(3), snr_idx)
        assert ("+2phase(auto:" in ex_auto.kernel_used
                and "(auto)" not in ex_auto.kernel_used)
        assert (a.fer_frames, a.error_bits, a.conv_iters_sum, a.conv_count,
                a.norm_llr_sum, a.ok_blocks, a.blocks) == (
            b.fer_frames, b.error_bits, b.conv_iters_sum, b.conv_count,
            b.norm_llr_sum, b.ok_blocks, b.blocks)
    # at 0 dB (FER ~ 1) the probe must have declined the split
    assert ex_auto._two_phase_choice[0.0] is False


def test_two_phase_explicit_vmem_overflow_raises(monkeypatch):
    """An explicit --two-phase N whose LLR-emit block cannot fit VMEM must
    raise (mirroring fused='on'), while 'auto' silently runs single-phase."""
    import ldpc_tpu.ops.mc_pallas as mcp
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor

    code = LDPCCode(alist=ccsds(128), name="ccsds_128")
    base = mcp.mc_vmem_bytes(code.qc, noise_source="input", track_norm=False)
    with_emit = mcp.mc_vmem_bytes(code.qc, noise_source="input",
                                  track_norm=False, emit_llr=True)
    assert with_emit > base
    monkeypatch.setattr(mcp, "VMEM_BUDGET", (base + with_emit) // 2)
    opts = dict(
        matrix="ccsds_128", blocks=128, iterations=8, ber=True, fer=True,
        fidelity="exact", batch=128, seed=0, fused="on",
    )
    with pytest.raises(ValueError, match="VMEM"):
        PointExecutor(code, SimOptions(two_phase="4", **opts))
    ex = PointExecutor(code, SimOptions(two_phase="auto", **opts))
    assert "2phase" not in ex.kernel_used


def test_two_phase_norm_llr_gate():
    """norm_llr_sum is an f32 accumulator that is not bit-stable across
    dispatch modes on hardware (parity_runs/tpu_two_phase_norm_evidence.json)
    -- the executor must refuse the split when the metric is tracked."""
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor

    code = LDPCCode(alist=ccsds(128), name="ccsds_128")
    opts = dict(
        matrix="ccsds_128", blocks=128, iterations=8, ber=True, fer=True,
        normalized_llr=True, fidelity="exact", batch=128, seed=0, fused="on",
    )
    with pytest.raises(ValueError, match="normalized-llr"):
        PointExecutor(code, SimOptions(two_phase="4", **opts))
    ex = PointExecutor(code, SimOptions(two_phase="auto", **opts))
    assert "2phase" not in ex.kernel_used


@slow
def test_two_phase_runner_counters_match():
    """End-to-end through PointExecutor: two-phase on vs off, same seed,
    identical counters (the composition is exercised exactly as production
    dispatch runs it, including skip-mask plumbing)."""
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor

    code = LDPCCode(alist=ccsds(128), name="ccsds_128")
    base = dict(
        matrix="ccsds_128", blocks=256, iterations=8, ber=True, fer=True,
        fidelity="exact", batch=128, seed=3, fused="on",
    )
    stats = {}
    for tp in ("off", "4"):
        ex = PointExecutor(code, SimOptions(two_phase=tp, **base))
        s = ex.run_point(4.0, 256, jax.random.key(3), 0)
        stats[tp] = s
        if tp == "4":
            assert "+2phase(4)" in ex.kernel_used
    a, b = stats["off"], stats["4"]
    assert a.fer_frames == b.fer_frames
    assert a.error_bits == b.error_bits
    assert a.conv_iters_sum == b.conv_iters_sum
    assert a.conv_count == b.conv_count
    assert a.norm_llr_sum == b.norm_llr_sum


def test_trip_model_remainder_lanes_consistent():
    """Non-multiple-of-128 probe batches must not inflate the phase-2 term:
    refeed draws from the same whole-tile population as single/phase1
    (round-4 self-review finding)."""
    import numpy as np

    from ldpc_tpu.sim.runner import two_phase_trip_model

    # 200 lanes: one full tile of easy frames + 72 remainder lanes of hard
    # ones -- the old code let the remainder form a phase-2 group while
    # normalizing by the single full tile
    conv = np.concatenate([np.full(128, 2), np.full(72, -1)])
    ok = conv >= 0
    m = two_phase_trip_model(conv, ok, phase1=6, max_iterations=12)
    assert m["refeed_tile_frac"] <= 1.0
    assert m["phase2_per_tile"] <= 12.0
    # the truncated population is the easy tile only: no refeed at all
    assert m["refeed_frac"] == 0.0
    assert m["single"] == 3.0


def test_resolve_two_phase_check_every_boundary():
    import pytest

    from ldpc_tpu.sim.runner import resolve_two_phase

    assert resolve_two_phase("auto", 12, 2) == 6
    assert resolve_two_phase("auto", 12, 4) == 4  # rounded down to boundary
    assert resolve_two_phase("auto", 6, 2) == 0  # too small to split
    assert resolve_two_phase(6, 12, 2) == 6
    with pytest.raises(ValueError, match="multiple of"):
        resolve_two_phase(5, 12, 2)
