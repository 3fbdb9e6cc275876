"""int8 extrinsic-message storage in the Pallas kernels (--msg-store int8).

The int8 grid itself was validated FER-free in examples/quantized_messages;
these tests cover the PRODUCTION wiring: storage round-trip correctness in
the decode loop (interpret mode), the VMEM accounting, and the
configuration guards (min-sum only, Pallas path only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.ops.spa_pallas import (
    E_INT8_CLIP,
    E_INT8_SCALE,
    make_qc_decoder,
    qc_vmem_bytes,
)
from ldpc_tpu.sim.config import SimOptions
from ldpc_tpu.sim.runner import PointExecutor, load_code


@pytest.fixture(scope="module")
def ccsds():
    return load_code("builtin:CCSDS_ldpc_n32_k16.alist.txt")


def _spec_info(code):
    spec = code.encode_spec("standard")
    return spec, np.asarray(spec.info_pos("orig"), np.int32)


@pytest.mark.parametrize("schedule", ["flooding", "layered"])
def test_int8_store_decodes_correctly(ccsds, schedule):
    """Easy channel: the int8-message NMS kernel must correct every frame
    and agree with the f32-message kernel's hard decisions (at high SNR the
    quantization error never crosses a decision boundary)."""
    from ldpc_tpu.ops.encode import make_encoder, random_info_bits

    spec, info_pos = _spec_info(ccsds)
    enc = make_encoder(spec, "orig")
    key = jax.random.key(3)
    u = random_info_bits(key, 8, ccsds.k)
    w = enc(u).astype(jnp.float32)
    sigma = 0.5
    noise = sigma * jax.random.normal(jax.random.fold_in(key, 1),
                                      w.shape, jnp.float32)
    llr = (2.0 / sigma**2) * ((2.0 * w - 1.0) + noise)

    kw = dict(variant="normalized_minsum", alpha=0.8, interpret=True,
              schedule=schedule)
    dec8 = make_qc_decoder(ccsds.qc, info_pos, 8, msg_store="int8", **kw)
    dec32 = make_qc_decoder(ccsds.qc, info_pos, 8, msg_store="f32", **kw)
    r8 = dec8(llr)
    r32 = dec32(llr)
    assert bool(jnp.all(r8.ok))
    np.testing.assert_array_equal(np.asarray(r8.est), np.asarray(w))
    np.testing.assert_array_equal(np.asarray(r8.est), np.asarray(r32.est))


def test_int8_grid_roundtrip_values():
    """The stored value is exactly q * scale for q in [-127, 127]."""
    vals = jnp.asarray([0.0, 1.0, -23.9, 24.0, 100.0, -100.0])
    q = jnp.round(jnp.clip(vals, -E_INT8_CLIP, E_INT8_CLIP)
                  / E_INT8_SCALE).astype(jnp.int8)
    back = q.astype(jnp.float32) * E_INT8_SCALE
    assert float(jnp.abs(back[:4] - jnp.clip(vals[:4], -24, 24)).max()) \
        <= E_INT8_SCALE / 2 + 1e-6
    assert float(back[4]) == pytest.approx(24.0, abs=1e-5)
    assert float(back[5]) == pytest.approx(-24.0, abs=1e-5)


def test_int8_vmem_accounting(ccsds):
    # tiny lifts LOSE: Z=4 pads to int8's 32-row sublane tile (8x), so the
    # int8 E scratch is BIGGER than f32's for CCSDS n32 -- the accounting
    # must reflect the real tiling, not a naive /4
    assert qc_vmem_bytes(ccsds.qc, "layered", msg_store="int8") \
        > qc_vmem_bytes(ccsds.qc, "layered")
    # for wimax Z=48 (pads to 64 in int8) the E scratch shrinks 3x
    wimax = load_code("builtin:wimax_1152_0.5.alist.txt")
    assert qc_vmem_bytes(wimax.qc, "layered", msg_store="int8") \
        < qc_vmem_bytes(wimax.qc, "layered")
    # the E scratch is flattened to exact per-row slot counts (round 5:
    # no dcb padding), so the f32/int8 delta is priced per edge slot
    e_slots = sum(len(r) for r in wimax.qc.row_slots())
    e_f32 = 4 * 128 * e_slots * wimax.qc.Z
    e_i8 = 1 * 128 * e_slots * 64
    assert qc_vmem_bytes(wimax.qc, "layered") \
        - qc_vmem_bytes(wimax.qc, "layered", msg_store="int8") \
        == e_f32 - e_i8


def test_int8_requires_minsum(ccsds):
    _, info_pos = _spec_info(ccsds)
    with pytest.raises(ValueError, match="min-sum"):
        make_qc_decoder(ccsds.qc, info_pos, 4, "spa", msg_store="int8",
                        interpret=True)


def test_int8_config_guards(ccsds):
    base = dict(
        matrix=ccsds.name, blocks=64, iterations=4, ber=True, fer=True,
        fidelity="exact", batch=64, quiet=True, msg_store="int8",
    )
    # SPA decoder rejected
    with pytest.raises(ValueError, match="min-sum"):
        PointExecutor(ccsds, SimOptions(**base))
    # XLA kernel rejected (int8 is a Pallas storage knob)
    with pytest.raises(ValueError, match="Pallas"):
        PointExecutor(ccsds, SimOptions(**{**base,
                                           "decoder": "normalized-minsum",
                                           "kernel": "xla"}))


def test_int8_cli_flag_roundtrip():
    from ldpc_tpu.cli import build_parser, options_from_args

    args = build_parser().parse_args(
        ["--matrix", "x", "--msg-store", "int8",
         "--decoder", "normalized-minsum"]
    )
    assert options_from_args(args).msg_store == "int8"
