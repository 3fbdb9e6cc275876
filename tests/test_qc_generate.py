"""QC code generation with girth-6 control (ldpc_tpu.models.generate)."""

from __future__ import annotations

import numpy as np
import pytest

from ldpc_tpu.models.code import LDPCCode
from ldpc_tpu.models.generate import qc_random, wimax_like
from ldpc_tpu.models.qc import detect_qc


def _no_4_cycles(al) -> bool:
    """Girth >= 6 <=> no two rows of H share more than one column."""
    H = al.to_dense().astype(np.int64)
    overlap = H @ H.T
    np.fill_diagonal(overlap, 0)
    return overlap.max() <= 1


@pytest.mark.parametrize("Z", [12, 20, 33])
def test_wimax_like_structure_and_girth(Z):
    al = wimax_like(Z, seed=1)
    assert (al.n, al.m) == (24 * Z, 12 * Z)
    assert _no_4_cycles(al)
    qc = detect_qc(al)
    assert qc is not None and qc.Z % Z == 0 and qc.n == 24 * Z
    code = LDPCCode(alist=al, name=f"wimax_like_{Z}")
    assert not code.rank_deficient


def test_wimax_like_differs_by_seed():
    a = wimax_like(16, seed=0).to_dense()
    b = wimax_like(16, seed=1).to_dense()
    assert not np.array_equal(a, b)


def test_qc_random_regular_girth6():
    al = qc_random(mb=4, nb=8, Z=16, row_weight=4, seed=3)
    assert (al.n, al.m) == (128, 64)
    assert (al.row_degrees() == 4).all()
    assert (al.col_degrees() == 2).all()
    assert _no_4_cycles(al)
    assert detect_qc(al) is not None


def test_generated_code_decodes():
    import jax

    from ldpc_tpu.ops.channel import ChannelParams, make_channel_fn
    from ldpc_tpu.ops.encode import make_encoder, random_info_bits
    from ldpc_tpu.ops.spa import make_decoder

    code = LDPCCode(alist=wimax_like(16, seed=2), name="wl16")
    spec = code.standard_encode_spec
    enc = make_encoder(spec, "orig")
    chan = make_channel_fn(1, 1)
    dec = make_decoder(code.layout("orig"), spec.info_pos("orig"), 20, "spa")
    key = jax.random.key(0)
    u = random_info_bits(key, 64, code.k)
    llr = chan(
        jax.random.fold_in(key, 1), enc(u),
        ChannelParams(snr_db=3.0, speed=0.5, noise_model="exact").consts(),
    )
    r = dec(llr)
    assert float(jnp_mean(r.ok)) > 0.9


def jnp_mean(x):
    import jax.numpy as jnp

    return jnp.mean(x.astype(jnp.float32))


def test_qc_random_rejects_overweight_rows():
    with pytest.raises(ValueError, match="row_weight"):
        qc_random(mb=4, nb=4, Z=16, row_weight=8)
