"""Fully-fused Monte-Carlo simulation step as one Pallas TPU kernel.

One kernel invocation per codeword tile performs the whole per-block pipeline
of the reference simulator (`python_ldpc_app/main.py:43-146`) except the
encode matmul: BPSK/QPSK-proxy modulation, AWGN / partial-band / jamming
noise drawn from the in-kernel hardware PRNG (Box-Muller), per-bit channel
LLRs (`channel.py:38-100` semantics), the full QC SPA/min-sum decode
(flooding or layered, shared loop with ldpc_tpu.ops.spa_pallas), and the
BER/FER/convergence counters (`main.py:319-339` conventions).

Why: at the waterfall operating point the XLA pipeline AROUND the decode
kernel (PRNG, channel, [B, n] LLR materialization, estimate write-back,
metric gathers) costs as much as a 12-iteration layered decode
(STATUS.md round-1 measurement). Fusing it means per batch the only HBM
traffic is the [n, B] encoded-bit matrix read once per tile and five
[1, B] counter rows written -- everything else lives in VMEM/registers.

The encode stays OUTSIDE the kernel as a dense GF(2) matmul on the MXU
(``parity = u @ P mod 2`` is exact in f32, ldpc_tpu.ops.encode): inside the
kernel it would pin an [n, k] generator in VMEM (10+ MB for WiMAX n=2304),
while outside it is a ~0.2 ms MXU op whose [n, B] f32 output costs one
streamed read.

Noise notes:
  * Normals use Box-Muller with a 48-bit-deep radial uniform (two PRNG
    words: 24 high + 24 low mantissa bits, minimum value 2^-49), capping
    the magnitude at sqrt(-2 ln 2^-49) = 8.24 sigma. For n=576 the
    probability a frame contains ANY capped sample is ~n * 2Q(8.24) ~=
    1e-13 -- negligible down to FER 1e-9 (the deep error-floor and
    importance-sampling regimes). The angle uniform keeps 24 bits (angle
    resolution does not affect tails). Round 1-2 used a 24-bit radial
    uniform (5.77 sigma cap, per-frame clip probability ~4.6e-6 at n=576);
    see examples/error_floor/README.md for the quantified bias of the old
    scheme and the re-measured tail points.
  * ``noise_source='hw'`` (TPU) seeds the per-core PRNG from (seed0, seed1,
    tile); ``noise_source='input'`` takes pre-drawn uint32 words as an extra
    input -- it runs in interpret mode on CPU and lets tests replay the
    exact draw stream through an independent jnp implementation
    (tests/test_mc_fused.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_tpu.models.qc import QCLayout
from ldpc_tpu.ops.metrics import BlockStats
from ldpc_tpu.ops.spa_pallas import (
    VMEM_BUDGET,
    make_decode_loop,
    stack_groups,
    ungroup_rows,
    unstack_groups,
)

TWO_PI = 2.0 * math.pi
_U24 = float(2.0**-24)
_HALF_U24 = float(2.0**-25)
_U48 = float(2.0**-48)
_HALF_U48 = float(2.0**-49)
_ONE_MINUS_U24 = float(1.0 - 2.0**-24)  # largest f32 strictly below 1


def _uniform01(raw_u32: jax.Array) -> jax.Array:
    """uint32 -> f32 uniform in (0, 1): 24-bit mantissa, never 0 or 1.

    The shifted value fits 24 bits, so the int32 hop is exact (Mosaic has no
    direct uint32 -> float32 cast)."""
    return (
        (raw_u32 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
        * _U24 + _HALF_U24
    )


def _uniform01_48(raw_hi: jax.Array, raw_lo: jax.Array) -> jax.Array:
    """Two uint32 words -> f32 uniform in (0, 1) with 48-bit DEPTH.

    The value is ``hi24 * 2^-24 + lo24 * 2^-48 + 2^-49``: for large values
    the low bits round away harmlessly (the result still has f32's 24-bit
    relative resolution), but near zero they survive, so the MINIMUM value
    is 2^-49 instead of 2^-25 -- through Box-Muller's sqrt(-2 ln u) that
    moves the normal-magnitude cap from 5.77 to 8.24 sigma. The sum is
    clamped to the largest f32 below 1 (a <=2^-25-probability rounding
    corner would otherwise yield exactly 1.0)."""
    hi = (raw_hi >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
    lo = (raw_lo >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
    return jnp.minimum(hi * _U24 + (lo * _U48 + _HALF_U48), _ONE_MINUS_U24)


def box_muller(raw1: jax.Array, raw1_lo: jax.Array,
               raw2: jax.Array) -> jax.Array:
    """Standard normal from three uint32 words (cosine branch)."""
    u1 = _uniform01_48(raw1, raw1_lo)
    u2 = _uniform01(raw2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(TWO_PI * u2)


def box_muller2(raw1: jax.Array, raw1_lo: jax.Array,
                raw2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """TWO independent standard normals from three uint32 words.

    Box-Muller yields a full 2-D Gaussian per uniform pair; using both the
    cosine and sine branches halves the PRNG words and the log/sqrt
    transcendentals per noise sample -- the channel section of the fused
    kernel generates noise for two adjacent base columns per draw triple.
    The radial uniform is 48-bit-deep (tail-exact to 8.24 sigma,
    :func:`_uniform01_48`); the angle keeps 24 bits."""
    u1 = _uniform01_48(raw1, raw1_lo)
    u2 = _uniform01(raw2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = TWO_PI * u2
    return r * jnp.cos(ang), r * jnp.sin(ang)


# raw-plane SLOTS per bit in the injected-noise layout, by channel mode
# (the hw path generates fewer words: normals come in cos/sin pairs shared
# by two adjacent base columns, so only the even column's planes of each
# normal are consumed -- see _make_channel_fill). Each normal pair takes
# THREE planes: radial hi, radial lo (48-bit depth), angle.
#   mode 1: 3 (one normal pair)   mode 2: 7 (two pairs + jam uniform)
#   mode 3: 6 (two pairs)
DRAWS_PER_BIT = {1: 3, 2: 7, 3: 6}

# SMEM layout of the runtime channel constants (matches ChannelConsts order)
_CONSTS = ("noise1_std", "llr_scale", "sigma1", "sigma2", "l_c1", "l_c2",
           "l_c3", "p")


def consts_vector(consts) -> jax.Array:
    """ChannelConsts -> f32 [8] vector for the kernel's SMEM input."""
    return jnp.stack([getattr(consts, f) for f in _CONSTS]).astype(jnp.float32)


def make_mc_decoder(
    qc: QCLayout,
    info_pos: np.ndarray,
    max_iterations: int,
    variant: str = "spa",
    *,
    mode: int = 1,
    modulation: int = 1,
    alpha: float = 0.75,
    beta: float = 0.15,
    tile_b: int = 128,
    schedule: str = "flooding",
    noise_source: str = "hw",
    interpret: bool = False,
    debug_llr: bool = False,
    emit_llr: bool = False,
    track_norm: bool = True,
    msg_store: str = "f32",
    layer_groups: list[list[int]] | None = None,
    check_every: int = 1,
    sublane_groups: int = 1,
):
    """Build ``mc_step(wT, consts_vec, seeds[, raw][, skip]) -> BlockStats-like``.

    ``wT``: f32 [n, B] encoded codeword bits in the decode domain (0/1),
    codewords on the minor axis. ``consts_vec``: f32 [8] from
    :func:`consts_vector`. ``seeds``: int32 [2] PRNG seed (hw source).
    ``raw``: uint32 [draws, n, B] pre-drawn words (input source).
    ``skip``: optional int32 scalar; nonzero makes the decode loop exit
    before iteration 0 (a vmapped SNR sweep stops paying for points that
    reached their error quota -- the caller discards skipped outputs).

    Returns per-codeword arrays ``(err_bits, ok, conv_iter, norm_llr,
    iters)`` with shapes int32/bool/int32/f32/int32 [B]; ``err_bits`` counts
    info-bit mismatches vs the transmitted word for EVERY frame (callers
    apply the reference's failed-frames-only rule, metrics.block_stats).

    ``emit_llr=True`` appends the in-kernel channel LLRs (f32 [n, B], in the
    DECODE domain, i.e. negated log(p0/p1)) as a sixth output -- the
    production hook for two-phase dispatch (sim.runner): frames this kernel
    leaves unconverged are compacted and re-decoded from exactly these LLR
    bits by :func:`make_llr_decoder`, which replays the identical per-lane
    trajectory (every decode op is lane-wise). ``debug_llr`` is the test
    variant of the same output, restricted to the injected-noise source.

    ``sublane_groups=G`` stacks G codeword groups into the sublane
    dimension (the small-Z utilization lever -- see
    spa_pallas.make_decode_loop). The wrapper's [n, B] / per-codeword
    surfaces are unchanged: inputs re-layout via ``stack_groups`` and
    outputs via ``unstack_groups``/``ungroup_rows`` (XLA reshapes, once
    per dispatch); within-block counter sums move to XLA. Per-codeword
    results stay bit-identical to G=1 in the injected-noise source; the
    hw source draws DIFFERENT noise per (tile, plane) geometry, so hw
    counters at G>1 equal G=1 statistically, not bitwise. Requires
    ``track_norm=False``.
    """
    variant = variant.lower().replace("-", "_")
    if variant not in ("spa", "minsum", "normalized_minsum", "offset_minsum"):
        raise ValueError(f"MC kernel does not support variant {variant!r}")
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"Unknown schedule: {schedule!r}")
    if mode not in (1, 2, 3):
        raise ValueError(f"Unknown channel mode: {mode}")
    if modulation not in (1, 2):
        raise ValueError("MC kernel supports modulation 1 (BPSK) / 2 (QPSK proxy)")
    if noise_source not in ("hw", "input"):
        raise ValueError(f"Unknown noise source: {noise_source!r}")
    if debug_llr and noise_source != "input":
        raise ValueError("debug_llr is an injected-noise test hook")
    emit = debug_llr or emit_llr

    n, Z, nb, mb = qc.n, qc.Z, qc.nb, qc.mb
    row_slots = qc.row_slots()
    e_slots = sum(len(r) for r in row_slots)  # flattened E: exact edge slots
    k = int(np.asarray(info_pos).shape[0])
    amp = 1.0 if modulation == 1 else 0.7  # channel.py:49-51
    draws = DRAWS_PER_BIT[mode]
    hw = noise_source == "hw"
    G = int(sublane_groups)
    GZ = G * Z  # stacked block height; == Z at G=1 (the original layout)
    RS = 1 if G == 1 else GZ  # row-output sublanes

    info_mask = np.zeros((n, 1), dtype=np.float32)
    info_mask[np.asarray(info_pos, dtype=np.int64), 0] = 1.0
    # the info mask rides in the w block's spare bits: w entries are 0/1,
    # so one int8 block carries w + 2*mask (values 0..3) and the kernel
    # splits them with &1 / >>1 -- no separate mask input block at all
    # (saves 128*n*G bytes of VMEM; at n=9216 that block was part of what
    # kept the fused kernel from compiling)
    mask_np = (
        info_mask if G == 1
        else np.tile(info_mask.reshape(nb, 1, Z, 1), (1, G, 1, 1))
        .reshape(n * G, 1)
    ).astype(np.int8)

    loop = make_decode_loop(
        qc, max_iterations, variant, alpha=alpha, beta=beta,
        tile_b=tile_b, schedule=schedule, k=k, track_norm=track_norm,
        msg_store=msg_store, layer_groups=layer_groups,
        check_every=check_every, sublane_groups=G,
    )
    e_dtype = jnp.int8 if msg_store == "int8" else jnp.float32
    # The layered schedule reads the channel LLRs ONLY at loop init
    # (posteriors update in place thereafter), so the llr scratch can
    # alias L: channel_fill writes straight into L_ref and the loop's
    # init is a self-assign. Saves an [nb, G*Z, tile_b] f32 buffer -- the
    # margin that lets the flagship-structure n=4608 code (Z=192) run the
    # fused SPA kernel at all (examples/big_code). Flooding re-reads the
    # LLRs in every posterior update and keeps the dedicated scratch.
    llr_aliases_L = schedule == "layered"

    def channel_fill(x_blk, get, llr_ref, c):
        """Fill every base column's channel LLRs (log(p0/p1) domain).

        ``x_blk(bj)``: transmitted bits 0/1 [Z, TB]; ``get(d, bj)``: uint32
        word plane -- slot d of base column bj in the injected layout (the
        hw source generates a fresh plane per request and only requests
        what the pairing consumes); ``c(name)``: runtime scalar. Adjacent
        base columns share one Box-Muller draw pair (cos/sin branches), and
        negation into log(p0/p1) is fused (the decode loop runs the exact
        parity rule)."""

        def bpsk(bj):
            return (2.0 * x_blk(bj) - 1.0) * amp

        for p in range(0, nb, 2):
            c0 = p
            c1 = p + 1 if p + 1 < nb else None
            if mode == 1:
                z0, z1 = box_muller2(get(0, c0), get(1, c0), get(2, c0))
                for bj, z in ((c0, z0),) + (((c1, z1),) if c1 is not None else ()):
                    llr_ref[bj] = -(
                        c("llr_scale") * (bpsk(bj) + c("noise1_std") * z)
                    )
                continue
            a0, a1 = box_muller2(get(0, c0), get(1, c0), get(2, c0))
            b0, b1 = box_muller2(get(3, c0), get(4, c0), get(5, c0))
            cols = ((c0, a0, b0),) + (
                ((c1, a1, b1),) if c1 is not None else ()
            )
            for bj, za, zb in cols:
                sym = bpsk(bj)
                n1 = c("sigma1") * za
                n2 = c("sigma2") * zb
                if mode == 2:
                    jam = _uniform01(get(6, bj)) < c("p")
                    llr = jnp.where(jam, (sym + n1 + n2) * c("l_c2"),
                                    (sym + n1) * c("l_c1"))
                else:  # mode 3
                    llr = ((sym + n1 + n2) * c("p")
                           + (sym + n1) * (1.0 - c("p"))) * c("l_c3")
                llr_ref[bj] = -llr

    def kernel(consts_ref, seeds_ref, skip_ref, w_ref, *refs):
        idx = 0
        if not hw:
            raw_in = refs[idx]
            idx += 1
        err_ref, ok_ref, conv_ref, norm_ref, iters_ref = refs[idx:idx + 5]
        idx += 5
        dllr_ref = refs[idx] if emit else None
        rest = refs[idx + 1 if emit else idx:]
        nscr = 2 + (1 if track_norm else 0) + (0 if llr_aliases_L else 1)
        scr = rest[-nscr:]
        E_ref, L_ref = scr[0], scr[1]
        prior_ref = scr[2] if track_norm else None
        llr_ref = L_ref if llr_aliases_L else scr[-1]
        TB = tile_b

        def c(name):
            return consts_ref[_CONSTS.index(name)]

        if hw:
            # Mosaic's prng_seed takes at most 2 words: fold the tile index
            # into the first with a Weyl-sequence odd constant (golden-ratio
            # hash; int32 wrap-around is the intended mixing)
            tile_mix = pl.program_id(0) * jnp.int32(-1640531527)
            pltpu.prng_seed(seeds_ref[0] + tile_mix, seeds_ref[1])

        def x_blk(j):
            # int8 block carries w + 2*mask (values 0..3); bit 0 is the
            # transmitted bit. Derived in f32 (Mosaic cannot lower int8
            # shifts -- arith.shrsi fails to legalize)
            v = w_ref[pl.ds(j * GZ, GZ), :].astype(jnp.float32)
            m = jnp.where(v >= 2.0, 1.0, 0.0)
            return v - 2.0 * m

        if hw:
            def get(d, bj):
                return pltpu.bitcast(
                    pltpu.prng_random_bits((GZ, TB)), jnp.uint32
                )
        else:
            def get(d, bj):
                return raw_in[d, pl.ds(bj * GZ, GZ), :]

        # ---- channel: fill the LLR scratch, two base columns per draw ----
        channel_fill(x_blk, get, llr_ref, c)
        if dllr_ref is not None:
            # expose the EXACT in-kernel LLR bits (decode domain): the
            # channel math compiles with FMA contraction inside the kernel
            # program, so an eager host replay can differ by 1 ulp --
            # two-phase dispatch (and tests needing strict decode
            # bit-identity) must consume these
            for bj in range(nb):
                dllr_ref[pl.ds(bj * GZ, GZ), :] = llr_ref[bj]

        def mask_blk(j):
            # bit 1 of the packed w block is the info mask (f32 compare:
            # Mosaic cannot lower int8 shifts)
            v = w_ref[pl.ds(j * GZ, GZ), :].astype(jnp.float32)
            return jnp.where(v >= 2.0, 1.0, 0.0)

        it, done_f, conv, norm = loop(
            lambda j: llr_ref[j], mask_blk, E_ref, L_ref, prior_ref,
            skip_f=skip_ref[0].astype(jnp.float32),
        )

        # ---- counters: info-bit mismatches vs the transmitted word ----
        # G=1: reduced over sublanes in-kernel; G>1: per-row partials only
        # (ungroup_rows finishes the within-block sum in XLA)
        err = jnp.zeros((1, TB) if G == 1 else (GZ, TB), jnp.float32)
        for bj in range(nb):
            est = (L_ref[bj] < 0).astype(jnp.float32)
            neq = (est != x_blk(bj)).astype(jnp.float32)
            if G == 1:
                err = err + jnp.sum(neq * mask_blk(bj), axis=0, keepdims=True)
            else:
                err = err + neq * mask_blk(bj)

        err_ref[:] = err
        ok_ref[:] = done_f
        conv_ref[:] = conv
        norm_ref[:] = norm
        iters_ref[:] = jnp.full((1, TB), it, jnp.int32)

    grid_kernel = functools.partial(pl.pallas_call, kernel, interpret=interpret)
    mask2_const = jnp.asarray(mask_np * np.int8(2))  # bit 1 = info mask

    def mc_step(wT: jax.Array, consts_vec: jax.Array, seeds: jax.Array,
                raw: jax.Array | None = None,
                skip: jax.Array | None = None):
        B = wT.shape[1]
        Bp = -(-B // (G * tile_b)) * (G * tile_b)
        w = wT.astype(jnp.int8)  # 0/1 bits: int8 block, cast in-kernel
        if Bp != B:
            w = jnp.pad(w, ((0, 0), (0, Bp - B)))
        if G > 1:
            w = stack_groups(w, Z, G, tile_b)
        w = w + mask2_const  # pack the mask into bit 1 (values 0..3)
        Bl = Bp // G  # kernel lane extent (grouped layout)
        grid = (Bl // tile_b,)
        skip_arr = (
            jnp.zeros((1,), jnp.int32) if skip is None
            else jnp.asarray(skip, jnp.int32).reshape((1,))
        )

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # consts [8]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seeds [2]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # skip [1]
            pl.BlockSpec((n * G, tile_b), lambda b: (0, b), memory_space=pltpu.VMEM),
        ]
        args = [consts_vec.astype(jnp.float32), seeds.astype(jnp.int32),
                skip_arr, w]
        if not hw:
            if raw is None:
                raise ValueError("noise_source='input' needs the raw words")
            rawp = raw
            if Bp != B:
                rawp = jnp.pad(raw, ((0, 0), (0, 0), (0, Bp - B)))
            if G > 1:
                rawp = jax.vmap(
                    lambda p: stack_groups(p, Z, G, tile_b)
                )(rawp)
            in_specs.append(
                pl.BlockSpec((draws, n * G, tile_b), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM)
            )
            args.append(rawp)

        out_row = lambda dt: jax.ShapeDtypeStruct((RS, Bl), dt)
        out_specs = [
            pl.BlockSpec((RS, tile_b), lambda b: (0, b),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ] + [
            pl.BlockSpec((1, tile_b), lambda b: (0, b),
                         memory_space=pltpu.VMEM)
        ]
        out_shape = [
            out_row(jnp.float32),
            out_row(jnp.float32),
            out_row(jnp.int32),
            out_row(jnp.float32),
            jax.ShapeDtypeStruct((1, Bl), jnp.int32),
        ]
        if emit:
            out_specs.append(
                pl.BlockSpec((n * G, tile_b), lambda b: (0, b),
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((n * G, Bl), jnp.float32))
        outs = grid_kernel(
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((e_slots, GZ, tile_b), e_dtype),  # E (flattened)
                pltpu.VMEM((nb, GZ, tile_b), jnp.float32),  # L
            ] + (
                [pltpu.VMEM((nb, GZ, tile_b), jnp.float32)]  # prior
                if track_norm else []
            ) + (
                []  # layered: channel LLRs live in L (read only at init)
                if llr_aliases_L else
                [pltpu.VMEM((nb, GZ, tile_b), jnp.float32)]  # llr
            ),
        )(*args)
        err, ok_f, conv, norm, iters = outs[:5]

        if G > 1:
            err_row = ungroup_rows(err, Z, G, tile_b, reduce="sum")
            ok_row = ungroup_rows(ok_f, Z, G, tile_b)
            conv_row = ungroup_rows(conv, Z, G, tile_b)
            norm_row = ungroup_rows(norm, Z, G, tile_b)
            T = Bl // tile_b
            it_row = jnp.broadcast_to(
                iters.reshape(T, 1, tile_b), (T, G, tile_b)
            ).reshape(Bp)
        else:
            err_row, ok_row, conv_row = err[0], ok_f[0], conv[0]
            norm_row, it_row = norm[0], iters[0]

        result = (
            err_row[:B].astype(jnp.int32),
            ok_row[:B] > 0,
            conv_row[:B],
            norm_row[:B],
            it_row[:B],
        )
        if emit:
            dllr = outs[5]
            if G > 1:
                dllr = unstack_groups(dllr, Z, G, tile_b)
            result = result + (dllr[:, :B],)
        return result

    return mc_step


def make_llr_decoder(
    qc: QCLayout,
    info_pos: np.ndarray,
    max_iterations: int,
    variant: str = "spa",
    *,
    alpha: float = 0.75,
    beta: float = 0.15,
    tile_b: int = 128,
    schedule: str = "flooding",
    interpret: bool = False,
    track_norm: bool = True,
    msg_store: str = "f32",
    layer_groups: list[list[int]] | None = None,
    check_every: int = 1,
    sublane_groups: int = 1,
):
    """Decode-from-LLRs with in-kernel counters and a per-lane pre-done mask.

    Phase 2 of the two-phase fused dispatch (sim.runner): the fused
    Monte-Carlo kernel runs a SHORT decode for every frame and emits its
    in-kernel LLRs (``emit_llr``); the caller compacts the unconverged
    frames to the front lanes and re-decodes only those here with the full
    iteration budget. Because every decode op is lane-wise, replaying a
    frame's exact LLR bits from iteration 0 reproduces the single-pass
    trajectory bit-for-bit -- tiles whose lanes are all pre-done exit before
    iteration 0, so the cost is ~ceil(unconverged/tile_b) tiles instead of
    the whole batch (at a waterfall point the mean tile trip count drops
    from ~max_iterations to ~phase1_iters + FER_phase1 * max_iterations).

    Returns ``llr_step(llrT, wT, done0) -> (err_bits, ok, conv_iter,
    norm_llr, iters)`` with the same shapes/conventions as
    :func:`make_mc_decoder`. ``llrT``: f32 [n, B] channel LLRs in the DECODE
    domain (as emitted by ``emit_llr``); ``wT``: f32 [n, B] transmitted bits
    (same lane order as ``llrT``); ``done0``: f32 [B], 1.0 pre-marks a lane
    converged (its outputs are placeholders the caller must discard).
    """
    variant = variant.lower().replace("-", "_")
    if variant not in ("spa", "minsum", "normalized_minsum", "offset_minsum"):
        raise ValueError(f"LLR kernel does not support variant {variant!r}")
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"Unknown schedule: {schedule!r}")

    n, Z, nb, mb = qc.n, qc.Z, qc.nb, qc.mb
    row_slots = qc.row_slots()
    e_slots = sum(len(r) for r in row_slots)  # flattened E: exact edge slots
    k = int(np.asarray(info_pos).shape[0])
    G = int(sublane_groups)
    GZ = G * Z
    RS = 1 if G == 1 else GZ

    info_mask = np.zeros((n, 1), dtype=np.float32)
    info_mask[np.asarray(info_pos, dtype=np.int64), 0] = 1.0
    mask_np = (
        info_mask if G == 1
        else np.tile(info_mask.reshape(nb, 1, Z, 1), (1, G, 1, 1))
        .reshape(n * G, 1)
    ).astype(np.int8)  # rides in the packed w block's bit 1 (see mc_step)

    loop = make_decode_loop(
        qc, max_iterations, variant, alpha=alpha, beta=beta,
        tile_b=tile_b, schedule=schedule, k=k, track_norm=track_norm,
        msg_store=msg_store, layer_groups=layer_groups,
        check_every=check_every, sublane_groups=G,
    )
    e_dtype = jnp.int8 if msg_store == "int8" else jnp.float32

    def kernel(w_ref, llr_ref, done_ref, err_ref, ok_ref,
               conv_ref, norm_ref, iters_ref, E_ref, L_ref, *rest):
        prior_ref = rest[0] if track_norm else None
        TB = tile_b

        def llr_blk(j):
            return llr_ref[pl.ds(j * GZ, GZ), :]

        def mask_blk(j):
            # bit 1 of the packed w block is the info mask (f32 compare:
            # Mosaic cannot lower int8 shifts)
            v = w_ref[pl.ds(j * GZ, GZ), :].astype(jnp.float32)
            return jnp.where(v >= 2.0, 1.0, 0.0)

        def x_blk(j):
            # int8 block carries w + 2*mask (values 0..3); bit 0 is the
            # transmitted bit. Derived in f32 (Mosaic cannot lower int8
            # shifts -- arith.shrsi fails to legalize)
            v = w_ref[pl.ds(j * GZ, GZ), :].astype(jnp.float32)
            m = jnp.where(v >= 2.0, 1.0, 0.0)
            return v - 2.0 * m

        it, done_f, conv, norm = loop(
            llr_blk, mask_blk, E_ref, L_ref, prior_ref,
            skip_f=done_ref[:],
        )

        err = jnp.zeros((1, TB) if G == 1 else (GZ, TB), jnp.float32)
        for bj in range(nb):
            est = (L_ref[bj] < 0).astype(jnp.float32)
            neq = (est != x_blk(bj)).astype(jnp.float32)
            if G == 1:
                err = err + jnp.sum(neq * mask_blk(bj), axis=0, keepdims=True)
            else:
                err = err + neq * mask_blk(bj)

        err_ref[:] = err
        ok_ref[:] = done_f
        conv_ref[:] = conv
        norm_ref[:] = norm
        iters_ref[:] = jnp.full((1, TB), it, jnp.int32)

    grid_kernel = functools.partial(pl.pallas_call, kernel, interpret=interpret)
    mask2_const = jnp.asarray(mask_np * np.int8(2))  # bit 1 = info mask

    def llr_step(llrT: jax.Array, wT: jax.Array, done0: jax.Array):
        B = llrT.shape[1]
        Bp = -(-B // (G * tile_b)) * (G * tile_b)
        llr = llrT.astype(jnp.float32)
        w = wT.astype(jnp.int8)  # 0/1 bits: int8 block, cast in-kernel
        # padded lanes pre-done: tiles made purely of padding never iterate
        d = jnp.reshape(done0.astype(jnp.float32), (1, B))
        if Bp != B:
            llr = jnp.pad(llr, ((0, 0), (0, Bp - B)))
            w = jnp.pad(w, ((0, 0), (0, Bp - B)))
            d = jnp.pad(d, ((0, 0), (0, Bp - B)), constant_values=1.0)
        Bl = Bp // G
        if G > 1:
            llr = stack_groups(llr, Z, G, tile_b)
            w = stack_groups(w, Z, G, tile_b)
            # done rows broadcast per group block: row g*Z+z of lane
            # column t*TB+l pre-marks codeword t*G*TB + g*TB + l
            T = Bl // tile_b
            d = jnp.broadcast_to(
                d.reshape(T, G, 1, tile_b), (T, G, Z, tile_b)
            ).transpose(1, 2, 0, 3).reshape(GZ, Bl)
        w = w + mask2_const  # pack the mask into bit 1 (values 0..3)
        grid = (Bl // tile_b,)

        out_row = lambda dt: jax.ShapeDtypeStruct((RS, Bl), dt)
        row_spec = pl.BlockSpec((RS, tile_b), lambda b: (0, b),
                                memory_space=pltpu.VMEM)
        iters_spec = pl.BlockSpec((1, tile_b), lambda b: (0, b),
                                  memory_space=pltpu.VMEM)
        err, ok_f, conv, norm, iters = grid_kernel(
            grid=grid,
            in_specs=[
                pl.BlockSpec((n * G, tile_b), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n * G, tile_b), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                row_spec,
            ],
            out_specs=[row_spec] * 4 + [iters_spec],
            out_shape=[
                out_row(jnp.float32),
                out_row(jnp.float32),
                out_row(jnp.int32),
                out_row(jnp.float32),
                jax.ShapeDtypeStruct((1, Bl), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((e_slots, GZ, tile_b), e_dtype),  # E (flattened)
                pltpu.VMEM((nb, GZ, tile_b), jnp.float32),  # L
            ] + (
                [pltpu.VMEM((nb, GZ, tile_b), jnp.float32)]  # prior
                if track_norm else []
            ),
        )(w, llr, d)

        if G > 1:
            T = Bl // tile_b
            return (
                ungroup_rows(err, Z, G, tile_b, reduce="sum")[:B]
                .astype(jnp.int32),
                ungroup_rows(ok_f, Z, G, tile_b)[:B] > 0,
                ungroup_rows(conv, Z, G, tile_b)[:B],
                ungroup_rows(norm, Z, G, tile_b)[:B],
                jnp.broadcast_to(
                    iters.reshape(T, 1, tile_b), (T, G, tile_b)
                ).reshape(Bp)[:B],
            )
        return (
            err[0, :B].astype(jnp.int32),
            ok_f[0, :B] > 0,
            conv[0, :B],
            norm[0, :B],
            iters[0, :B],
        )

    return llr_step


def mc_vmem_bytes(qc: QCLayout, schedule: str = "flooding",
                  tile_b: int = 128, noise_source: str = "hw",
                  mode: int = 1, track_norm: bool = True,
                  msg_store: str = "f32", emit_llr: bool = False,
                  sublane_groups: int = 1) -> int:
    """Resident VMEM of the fused MC kernel (scratch + blocks) per grid step.

    ``emit_llr=True`` adds the [n, lanes] LLR output block (two-phase
    dispatch); the same accounting also bounds :func:`make_llr_decoder`
    (its llr INPUT block replaces the emit output, its done row is noise,
    and it keeps a dedicated L scratch -- its llr input cannot alias L --
    so the flooding-shaped bound covers it).
    ``sublane_groups=G`` scales every per-column buffer and block by G
    (the grouped layout stacks G Z-blocks per array). Under the layered
    schedule the llr scratch aliases L (channel LLRs are read only at
    loop init), dropping one [nb, G*Z, lanes] f32 buffer; the info mask
    is an int8 block (1 byte/row-element).
    """
    lanes = max(tile_b, 128)
    G = max(int(sublane_groups), 1)
    GZ = G * qc.Z
    row_slots = qc.row_slots()
    e_slots = sum(len(r) for r in row_slots)  # flattened E: exact edge slots
    nbuf = 1 + (1 if track_norm else 0) + (0 if schedule == "layered" else 1)
    if msg_store == "int8":
        z_pad = -(-GZ // 32) * 32  # int8 sublane tile is 32 rows
        e_bytes = 1 * lanes * e_slots * z_pad
    else:
        e_bytes = 4 * lanes * GZ * e_slots
    scratch = e_bytes + 4 * lanes * GZ * nbuf * qc.nb
    rows8 = -(-qc.n * G // 32) * 32  # int8 blocks pad to 32-row tiles
    io = 1 * lanes * rows8  # w block (int8 0/1 bits)
    if emit_llr:
        io += 4 * lanes * qc.n * G  # llr output block (f32)
    if noise_source == "input":
        io += 4 * lanes * qc.n * G * DRAWS_PER_BIT[mode]
    # x2: the pallas pipeline double-buffers I/O blocks across grid steps
    # (validated against the wifi_648 G=4 scoped-vmem OOM)
    io *= 2
    # no separate mask block: the info mask rides in the w block's bit 1
    return scratch + io


def mc_kernel_fits(qc: QCLayout, schedule: str = "flooding",
                   tile_b: int = 128, noise_source: str = "hw",
                   mode: int = 1, track_norm: bool = True,
                   msg_store: str = "f32", emit_llr: bool = False,
                   sublane_groups: int = 1) -> bool:
    return mc_vmem_bytes(qc, schedule, tile_b, noise_source, mode,
                         track_norm, msg_store, emit_llr,
                         sublane_groups) <= VMEM_BUDGET


def channel_llr_reference(
    wT: jax.Array, raw: jax.Array, consts, mode: int, modulation: int,
    Z: int,
) -> jax.Array:
    """Independent jnp replay of the kernel's bits->LLR transform.

    Given the same raw uint32 draw stream ([draws, n, B] in the injected
    layout), produces EXACTLY the LLRs (in the channel's sign convention,
    before the kernel's negation) that ``noise_source='input'`` computes --
    the hook for bit-identity tests of the fused kernel against the unfused
    decoders. ``Z`` is the QC lift size: adjacent base columns share one
    Box-Muller pair (even column's planes, cos/sin branches), so the
    pairing must be replayed block-wise.
    """
    amp = 1.0 if modulation == 1 else 0.7
    n, B = wT.shape
    nb = n // Z
    sym = (2.0 * wT.astype(jnp.float32) - 1.0) * amp

    def blk(x, bj):
        return x[bj * Z:(bj + 1) * Z]

    # normals per column from the even column's draw planes
    z1 = [None] * nb  # first normal (n1 / mode-1 noise)
    z2 = [None] * nb  # second normal (n2), modes 2/3
    for p in range(0, nb, 2):
        a0, a1 = box_muller2(blk(raw[0], p), blk(raw[1], p), blk(raw[2], p))
        z1[p] = a0
        if p + 1 < nb:
            z1[p + 1] = a1
        if mode != 1:
            b0, b1 = box_muller2(blk(raw[3], p), blk(raw[4], p),
                                 blk(raw[5], p))
            z2[p] = b0
            if p + 1 < nb:
                z2[p + 1] = b1
    zA = jnp.concatenate(z1, axis=0)
    if mode == 1:
        return consts.llr_scale * (sym + consts.noise1_std * zA)
    zB = jnp.concatenate(z2, axis=0)
    n1 = consts.sigma1 * zA
    n2 = consts.sigma2 * zB
    if mode == 2:
        jam = _uniform01(raw[6]) < consts.p
        return jnp.where(jam, (sym + n1 + n2) * consts.l_c2,
                         (sym + n1) * consts.l_c1)
    return ((sym + n1 + n2) * consts.p + (sym + n1) * (1.0 - consts.p)) \
        * consts.l_c3
