"""Sublane grouping (spa_pallas sublane_groups=G): bit-identity vs G=1.

The grouped layout stacks G independent 128-codeword groups into the
sublane dimension (the small-Z utilization lever, VERDICT round-4 weak #2).
Everything per codeword must be BIT-identical to G=1: the grouped roll is
the same per-block rotation, the rotate-OR syndrome reduce computes the
same per-group 'any unsat', freezing is per (group, lane) exactly as it was
per lane. Only the tile-coupled ``iters`` readback legitimately differs
(one tile now exits when all G*128 of its codewords converge).

Reference chain being accelerated: spa_decoder.py:63-280 (the decode),
main.py:43-146 (the per-block pipeline) -- see spa_pallas/mc_pallas.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ldpc_tpu.ops.channel import ChannelParams
from ldpc_tpu.ops.encode import make_encoder_T, random_info_bits
from ldpc_tpu.ops.mc_pallas import (
    DRAWS_PER_BIT,
    consts_vector,
    make_llr_decoder,
    make_mc_decoder,
    mc_vmem_bytes,
)
from ldpc_tpu.ops.spa_pallas import (
    make_qc_decoder,
    qc_vmem_bytes,
    stack_groups,
    ungroup_rows,
    unstack_groups,
)
from ldpc_tpu.sim.config import SimOptions
from ldpc_tpu.sim.runner import PointExecutor, load_code, resolve_sublane_groups


@pytest.fixture(scope="module")
def ccsds32():
    return load_code("builtin:CCSDS_ldpc_n32_k16.alist.txt")  # Z=4


@pytest.fixture(scope="module")
def itu336():
    return load_code("builtin:LDPC_N336_K196_ITU_G.h.alist.txt")  # Z=14


def _info_pos(code):
    return np.asarray(code.standard_encode_spec.info_pos("orig"), np.int32)


def test_stack_unstack_roundtrip():
    rng = np.random.default_rng(0)
    Z, nb, G, TB, T = 4, 8, 4, 128, 2
    x = jnp.asarray(rng.normal(size=(nb * Z, T * G * TB)), jnp.float32)
    s = stack_groups(x, Z, G, TB)
    assert s.shape == (nb * Z * G, T * TB)
    assert np.array_equal(np.asarray(unstack_groups(s, Z, G, TB)),
                          np.asarray(x))
    # element mapping: stacked row bj*G*Z + g*Z + z, col t*TB + l holds
    # x[bj*Z + z, t*G*TB + g*TB + l]
    bj, g, z, t, l = 3, 2, 1, 1, 17
    assert float(s[bj * G * Z + g * Z + z, t * TB + l]) == float(
        x[bj * Z + z, t * G * TB + g * TB + l]
    )


def test_ungroup_rows_first_and_sum():
    rng = np.random.default_rng(1)
    Z, G, TB, T = 3, 2, 128, 2
    y = jnp.asarray(rng.normal(size=(G * Z, T * TB)), jnp.float32)
    first = np.asarray(ungroup_rows(y, Z, G, TB))
    summed = np.asarray(ungroup_rows(y, Z, G, TB, reduce="sum"))
    yn = np.asarray(y)
    for t in range(T):
        for g in range(G):
            for l in (0, 5, 127):
                c = t * G * TB + g * TB + l
                assert first[c] == yn[g * Z, t * TB + l]
                assert summed[c] == pytest.approx(
                    yn[g * Z:(g + 1) * Z, t * TB + l].sum()
                )


@pytest.mark.parametrize("schedule", ["flooding", "layered"])
def test_qc_decoder_grouped_bit_identity(ccsds32, schedule):
    code = ccsds32
    info_pos = _info_pos(code)
    # channel-realistic LLRs so lanes converge at different iterations
    # (exercising the per-(group, lane) freeze paths)
    rng = np.random.default_rng(2)
    B = 512
    bits = rng.integers(0, 2, size=(B, code.n))  # random words: most fail,
    sign = 1 - 2 * bits                          # some "converge" to other
    llr = jnp.asarray(                           # codewords -- both paths hit
        -(sign * 2.2 + rng.normal(size=(B, code.n))), jnp.float32
    )
    kw = dict(schedule=schedule, interpret=True, track_norm=False)
    r1 = make_qc_decoder(code.qc, info_pos, 10, "spa", **kw)(llr)
    for G in (2, 4):
        rg = make_qc_decoder(code.qc, info_pos, 10, "spa",
                             sublane_groups=G, **kw)(llr)
        assert np.array_equal(np.asarray(r1.est), np.asarray(rg.est))
        assert np.array_equal(np.asarray(r1.ok), np.asarray(rg.ok))
        assert np.array_equal(np.asarray(r1.conv_iter),
                              np.asarray(rg.conv_iter))


def test_qc_decoder_grouped_nonpow2_z(itu336):
    """Z=14 (non-power-of-2): the rotate-OR reduce must still cover the
    whole block (idempotent OR with wrapped overlapping windows)."""
    code = itu336
    info_pos = _info_pos(code)
    rng = np.random.default_rng(3)
    B = 256
    u = jnp.asarray(rng.integers(0, 2, size=(B, code.k)), jnp.uint8)
    from ldpc_tpu.ops.encode import make_encoder

    w = make_encoder(code.standard_encode_spec, "orig")(u)
    sign = 1.0 - 2.0 * w.astype(jnp.float32)
    noise = jnp.asarray(rng.normal(size=(B, code.n)), jnp.float32)
    llr = -(sign * 2.0 + 0.8 * noise) * 2.5
    kw = dict(schedule="layered", interpret=True, track_norm=False)
    r1 = make_qc_decoder(code.qc, info_pos, 8, "spa", **kw)(llr)
    rg = make_qc_decoder(code.qc, info_pos, 8, "spa",
                         sublane_groups=4, **kw)(llr)
    ok = np.asarray(r1.ok)
    assert ok.mean() > 0.5  # the reduce must actually detect convergence
    assert np.array_equal(ok, np.asarray(rg.ok))
    assert np.array_equal(np.asarray(r1.est), np.asarray(rg.est))
    assert np.array_equal(np.asarray(r1.conv_iter), np.asarray(rg.conv_iter))


@pytest.mark.parametrize("check_every", [1, 2])
def test_mc_fused_grouped_bit_identity(ccsds32, check_every):
    """Fused MC kernel with injected noise: per-codeword counters and the
    emitted LLR plane are bit-identical to G=1 (paired layered order)."""
    code = ccsds32
    qc = code.qc
    info_pos = _info_pos(code)
    encode_T = make_encoder_T(code.standard_encode_spec, "orig")
    B = 384  # non-multiple of G*128: exercises the padding path
    u = random_info_bits(jax.random.key(7), B, code.k)
    wT = encode_T(u)
    consts = ChannelParams(mode=1, snr_db=5.0, speed=code.k / code.n,
                           noise_model="exact").consts()
    cv = consts_vector(consts)
    raw = jax.random.bits(jax.random.key(9), (DRAWS_PER_BIT[1], code.n, B),
                          jnp.uint32)
    seeds = jnp.zeros((2,), jnp.int32)
    from ldpc_tpu.models.qc import paired_layer_groups

    kw = dict(schedule="layered", noise_source="input", interpret=True,
              track_norm=False, emit_llr=True,
              layer_groups=paired_layer_groups(qc),
              check_every=check_every)
    o1 = make_mc_decoder(qc, info_pos, 12, "spa", **kw)(wT, cv, seeds, raw)
    assert float(jnp.mean(o1[1].astype(jnp.float32))) > 0.9
    for G in (2, 8):
        og = make_mc_decoder(qc, info_pos, 12, "spa", sublane_groups=G,
                             **kw)(wT, cv, seeds, raw)
        for nm, a, b in zip(("err", "ok", "conv", "norm", "iters", "llr"),
                            o1, og):
            if nm == "iters":
                continue  # tile-coupled trip counts legitimately differ
            assert np.array_equal(np.asarray(a), np.asarray(b)), (G, nm)


def test_llr_decoder_grouped_active_lanes(ccsds32):
    """Phase-2 LLR decoder: grouped results equal G=1 on every lane the
    pre-done mask leaves active (pre-done lanes emit placeholders)."""
    code = ccsds32
    info_pos = _info_pos(code)
    encode_T = make_encoder_T(code.standard_encode_spec, "orig")
    B = 256
    u = random_info_bits(jax.random.key(1), B, code.k)
    wT = encode_T(u)
    consts = ChannelParams(mode=1, snr_db=4.0, speed=code.k / code.n,
                           noise_model="exact").consts()
    cv = consts_vector(consts)
    raw = jax.random.bits(jax.random.key(2), (DRAWS_PER_BIT[1], code.n, B),
                          jnp.uint32)
    mc = make_mc_decoder(code.qc, info_pos, 12, "spa", schedule="layered",
                         noise_source="input", interpret=True,
                         track_norm=False, emit_llr=True)
    llrT = mc(wT, cv, jnp.zeros((2,), jnp.int32), raw)[5]
    done0 = jnp.asarray(np.random.default_rng(4).random(B) < 0.4, jnp.float32)
    kw = dict(schedule="layered", interpret=True, track_norm=False)
    r1 = make_llr_decoder(code.qc, info_pos, 12, "spa", **kw)(llrT, wT, done0)
    rg = make_llr_decoder(code.qc, info_pos, 12, "spa", sublane_groups=4,
                          **kw)(llrT, wT, done0)
    act = np.asarray(done0) < 0.5
    for nm, a, b in zip(("err", "ok", "conv", "norm", "iters"), r1, rg):
        if nm == "iters":
            continue
        assert np.array_equal(np.asarray(a)[act], np.asarray(b)[act]), nm


def test_point_executor_grouped_counters_match(ccsds32):
    """End-to-end runner wiring: a fused PointExecutor at sublane_groups=8
    produces the same per-point counters as sublane_groups=1 (injected
    noise on CPU is bit-stable across the grouped re-layout)."""
    code = ccsds32

    def run(groups):
        opts = SimOptions(
            matrix=code.name, blocks=512, iterations=12, ber=True, fer=True,
            fidelity="exact", batch=256, seed=0, schedule="layered",
            layer_order="paired", check_every=2, speed=code.k / code.n,
            fused="on", two_phase="off", quiet=True,
            sublane_groups=groups,
        )
        ex = PointExecutor(code, opts)
        s = ex.run_point(4.5, 512, jax.random.key(5), 0)
        return ex, s

    ex1, s1 = run(1)
    ex8, s8 = run(8)
    assert "+sg8" in ex8.kernel_used and "+sg" not in ex1.kernel_used
    assert (s1.blocks, s1.ok_blocks, s1.error_bits, s1.fer_frames) == (
        s8.blocks, s8.ok_blocks, s8.error_bits, s8.fer_frames
    )
    assert s1.conv_iters_sum == s8.conv_iters_sum


def test_resolve_sublane_groups_rules(ccsds32, itu336):
    class O:
        sublane_groups = "auto"
        normalized_llr = False

    o = O()
    assert resolve_sublane_groups(None, o) == 1
    # auto rule from the device-bound-window campaign
    # (examples/sublane_fill): fill one (8, 128) vreg when Z < 8
    # (Z=4 -> G=2, measured x1.52-1.60); never group at Z >= 8
    # (measured 10-40% losses)
    assert resolve_sublane_groups(ccsds32.qc, o) == 2
    assert resolve_sublane_groups(itu336.qc, o) == 1
    # normalized-LLR tracking disables grouping
    o_norm = O()
    o_norm.normalized_llr = True
    assert resolve_sublane_groups(ccsds32.qc, o_norm) == 1
    o3 = O()
    o3.sublane_groups = "4"
    assert resolve_sublane_groups(ccsds32.qc, o3) == 4
    # explicit G that does not fit the VMEM plan raises
    o5 = O()
    o5.sublane_groups = 16
    with pytest.raises(ValueError, match="VMEM"):
        resolve_sublane_groups(ccsds32.qc, o5, fits=lambda g: g <= 8)
    # explicit grouping on a non-QC code raises
    o6 = O()
    o6.sublane_groups = 2
    with pytest.raises(ValueError, match="quasi-cyclic"):
        resolve_sublane_groups(None, o6)


def test_vmem_accounting_scales_with_groups(ccsds32):
    qc = ccsds32.qc
    b1 = qc_vmem_bytes(qc, "layered", track_norm=False)
    b8 = qc_vmem_bytes(qc, "layered", track_norm=False, sublane_groups=8)
    assert b8 > b1 * 4  # scratch and I/O scale ~G
    m1 = mc_vmem_bytes(qc, "layered", track_norm=False)
    m8 = mc_vmem_bytes(qc, "layered", track_norm=False, sublane_groups=8)
    assert m8 > m1 * 4


def test_grouped_requires_no_norm_tracking(ccsds32):
    with pytest.raises(ValueError, match="track_norm"):
        make_qc_decoder(ccsds32.qc, _info_pos(ccsds32), 8, "spa",
                        interpret=True, track_norm=True, sublane_groups=4)
