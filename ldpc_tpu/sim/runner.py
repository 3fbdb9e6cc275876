"""SNR-sweep simulation runner.

TPU re-design of the reference driver (`python_ldpc_app/main.py:178-442`):
instead of a Python loop spawning one process per codeword, a whole batch of
codewords runs the full encode -> interleave -> channel -> deinterleave ->
decode -> count pipeline as ONE jitted program; the SNR sweep reuses a single
compiled step (channel scale factors are runtime scalars), and Monte-Carlo
batches stream until the requested block count is reached. Error counters are
reduced on device; only seven scalars come back to the host per batch.

With a `jax.sharding.Mesh`, the codeword batch axis is sharded across chips
(the TPU equivalent of the reference's ProcessPoolExecutor fan-out,
main.py:241-292) and the counter reductions become psums over ICI.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from datetime import datetime
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_tpu.models.code import LDPCCode
from ldpc_tpu.ops.channel import ChannelConsts, ChannelParams, make_channel_fn
from ldpc_tpu.ops.encode import make_encoder, random_info_bits
from ldpc_tpu.ops.interleave import make_interleaver
from ldpc_tpu.ops.metrics import (
    BlockCounters,
    BlockStats,
    block_stats,
    pack_counters,
    reduce_block_stats,
    unpack_counters,
)
from ldpc_tpu.ops.spa import make_decoder
from ldpc_tpu.sim.config import SimOptions
from ldpc_tpu.sim.results import SimulationConfig, SimulationResult, SNRPointResult


@lru_cache(maxsize=16)
def load_code(path: str) -> LDPCCode:
    """Load a code from a file path, database basename, or built-in name
    (see ldpc_tpu.utils.db.resolve_matrix)."""
    from ldpc_tpu.utils.db import resolve_matrix

    resolved = resolve_matrix(path)
    if resolved.startswith("builtin:"):
        from ldpc_tpu.models import standards

        name = resolved[len("builtin:"):]
        return LDPCCode(alist=standards.make_builtin(name), name=name)
    return LDPCCode(resolved)


_PALLAS_VARIANTS = ("spa", "minsum", "normalized_minsum", "offset_minsum")


def resolve_layer_groups(qc, opts, schedule: str) -> list[list[int]] | None:
    """Layer groups for the paired layered sweep, or None for serial.

    ``--layer-order paired`` groups disjoint-support base rows
    (models.qc.paired_layer_groups) so each layered step carries two
    independent dependence chains. Returns None when pairing is off, the
    schedule is not layered, the code is not QC, or no disjoint pair exists
    (then the greedy grouping IS the serial order and the kernels should
    stay byte-identical to serial).
    """
    if getattr(opts, "layer_order", "serial") != "paired":
        return None
    if schedule != "layered" or qc is None:
        return None
    from ldpc_tpu.models.qc import paired_layer_groups

    groups = paired_layer_groups(qc)
    if all(len(g) == 1 for g in groups):
        return None
    return groups


def resolve_two_phase(two_phase: str | int, max_iterations: int,
                      check_every: int = 1) -> int:
    """Phase-1 iteration count for two-phase fused dispatch, or 0 for off.

    'auto' splits the budget in half once there is enough of one to split
    (>= 8 iterations: below that phase 1 converges too little for the
    compaction to pay for the extra dispatch) -- the executor then gates the
    split per SNR point with a probe batch (PointExecutor._decide_two_phase:
    at FER~1 the split is strictly slower). 'off' disables; an explicit
    N must satisfy 0 < N < max_iterations and forces the split everywhere.
    Results are bit-identical either way (tests/test_two_phase.py,
    parity_runs/tpu_two_phase.json), so this is purely a dispatch knob.

    Under a gated syndrome cadence (``check_every`` > 1) the phase-1
    budget must land on a check boundary (the kernel only detects
    convergence there): 'auto' rounds its half-budget DOWN to a multiple
    of check_every (losing the split entirely when that hits 0); an
    explicit N that is not a multiple raises."""
    if two_phase in ("off", "0", 0):
        return 0
    if two_phase == "auto":
        p1 = max_iterations // 2 if max_iterations >= 8 else 0
        return p1 - (p1 % check_every)
    try:
        n = int(two_phase)
    except (TypeError, ValueError):
        raise ValueError(
            f"--two-phase must be 'auto', 'off' or an integer: {two_phase!r}"
        ) from None
    if not 0 < n < max_iterations:
        raise ValueError(
            f"--two-phase phase-1 iterations must be in (0, max_iterations="
            f"{max_iterations}): {n}"
        )
    if n % check_every:
        raise ValueError(
            f"--two-phase {n} must be a multiple of --check-every "
            f"{check_every}: convergence is only detected at check "
            "boundaries"
        )
    return n


def two_phase_trip_model(
    conv: np.ndarray, ok: np.ndarray, phase1: int, max_iterations: int,
    lanes: int = 128,
) -> dict:
    """Predicted mean loop trips per 128-lane tile for both dispatch modes,
    from one batch's per-frame convergence iterations.

    The kernel's unit of work is the tile: it iterates until ALL its lanes
    pass the syndrome, so a lane's trip count is conv_iter+1 if it converged
    else max_iterations, and a tile's is the max over its lanes.

    * ``single``: mean tile trips of a single-pass dispatch.
    * ``phase1_mean``: mean tile trips of phase 1 (the same tiles capped at
      the phase-1 budget).
    * ``phase2_per_tile``: re-decode trips amortized over ALL tiles -- the
      unconverged-in-phase-1 lanes grouped 128 at a time in original order
      (exactly what the stable argsort compaction produces), each group
      running to its own max lane trips.
    * ``refeed_frac``: fraction of lanes phase 1 leaves unconverged.

    Two-phase dispatch wins when ``phase1_mean + phase2_per_tile +
    overhead < single`` (see PointExecutor._decide_two_phase).
    """
    trips = np.where(ok, conv.astype(np.int64) + 1, max_iterations)
    if trips.size >= lanes:
        # truncate to whole tiles and use the SAME truncated population for
        # both phases: mixing whole-tile single/phase1 stats with a refeed
        # drawn from the remainder lanes too would inflate phase2_per_tile
        # (normalized by the truncated ntiles) and push refeed_tile_frac
        # past 1 on non-multiple-of-128 probe batches
        trips = trips[: (trips.size // lanes) * lanes]
        tiles = trips.reshape(-1, lanes)
    else:
        tiles = trips.reshape(1, -1)
    ntiles = tiles.shape[0]
    t_single = tiles.max(axis=1)
    refeed = trips[trips > phase1]
    phase2_sum, n_groups = 0.0, 0
    for g in range(0, refeed.size, lanes):
        phase2_sum += float(refeed[g:g + lanes].max())
        n_groups += 1
    return {
        "single": float(t_single.mean()),
        "phase1_mean": float(np.minimum(t_single, phase1).mean()),
        "phase2_per_tile": phase2_sum / ntiles,
        "refeed_frac": refeed.size / max(trips.size, 1),
        # fraction of tiles phase 2 actually iterates (its loop init and
        # counter tails run only there) -- the roofline census needs it
        "refeed_tile_frac": n_groups / ntiles,
    }


def resolve_sublane_groups(qc, opts, fits=None) -> int:
    """Sublane-group count G for the Pallas decode loops (1 = off).

    G stacks G independent 128-codeword groups into the sublane dimension
    (spa_pallas.make_decode_loop) -- the round-4 small-Z utilization
    hypothesis, settled in round 5 by TWO measurement campaigns
    (examples/sublane_fill, paired A/B windows on v5e):

    * With tunnel-latency-bound 64-batch windows, grouping measured
      -16%..+6% everywhere -- but that campaign measured the LINK, not
      the kernel (the binder experiment: ~28 ms serialized latency per
      dispatch; fixed by _max_chunk_steps).
    * Re-measured with device-bound windows: grouping wins EXACTLY where
      the vector registers are underfilled -- Z=4 gains x1.52-1.60 at
      G in [2, 8] (flat across that range) -- and LOSES 10-40% for every
      Z >= 8 (the arrays already fill whole vregs; grouping only adds
      the 3x grouped-roll cost and the coupled tile exit).

    Auto rule, from that data: ``G = 8 // Z`` when Z < 8 (fill one
    (8, 128) vreg -- the smallest G captures the whole win), else 1.
    Explicit --sublane-groups N overrides (bit-identical per-codeword
    counters either way, tests/test_sublane_groups.py).

    ``fits(G) -> bool`` gates an explicit G on the caller's VMEM plan
    (approximate at G > 1: Mosaic's scoped-vmem accounting includes
    kernel temporaries the plan cannot see, so a fitting-by-plan G may
    still OOM at compile -- the error is loud and the fix is a smaller
    G). Grouping requires track_norm off.
    """
    sel = getattr(opts, "sublane_groups", "auto")
    if qc is None:
        if sel not in ("auto", 1, "1"):
            raise ValueError(
                "--sublane-groups > 1 requires a quasi-cyclic code"
            )
        return 1
    if sel == "auto":
        if opts.normalized_llr or qc.Z >= 8:
            return 1
        G = max(8 // qc.Z, 1)
        while G > 1 and fits is not None and not fits(G):
            G //= 2
        return G
    G = int(sel)
    if G > 1 and opts.normalized_llr:
        raise ValueError(
            "--sublane-groups > 1 is incompatible with --normalized-llr"
        )
    if G > 1 and fits is not None and not fits(G):
        raise ValueError(
            f"--sublane-groups {G}: the grouped kernel layout exceeds the "
            "VMEM plan for this code (spa_pallas.qc_vmem_bytes / "
            "mc_pallas.mc_vmem_bytes); use a smaller G or 'auto'"
        )
    return G


def _select_decoder(code, opts, layout, info_pos, max_iterations, batch=0):
    """Pick the decode kernel: the fused QC Pallas kernel when the code is
    quasi-cyclic and the configuration supports it, else the XLA decoder.
    Both produce bit-identical results (see tests/test_pallas.py)."""
    variant = opts.decoder_variant
    on_tpu = jax.default_backend() == "tpu"
    want = opts.kernel
    schedule = opts.schedule or "flooding"
    # per-iteration / degree-specific --minsum-alpha schedules run on every
    # decode path (XLA, layered, Pallas, fused): the kernels resolve
    # alpha[min(it, T-1)] per iteration (spa_pallas.resolve_alpha_schedule)
    vector_alpha = np.ndim(opts.minsum_alpha) > 0
    if vector_alpha and variant != "normalized_minsum":
        raise ValueError(
            "a per-iteration --minsum-alpha schedule requires "
            "--decoder normalized-minsum"
        )
    int8_msgs = opts.msg_store == "int8"
    if int8_msgs and variant not in ("minsum", "normalized_minsum",
                                     "offset_minsum"):
        raise ValueError(
            "--msg-store int8 requires a min-sum decoder variant (the SPA "
            "tanh rule loses FER under message quantization, "
            "examples/quantized_messages)"
        )
    eligible = (
        variant in _PALLAS_VARIANTS
        and opts.check_rule == "exact"
        and opts.decode_graph in ("orig", "original")
        and code.qc is not None
    )
    use_pallas = (want == "pallas" and eligible) or (
        want == "auto" and eligible and on_tpu
    )
    if want == "pallas" and not eligible:
        raise ValueError(
            "kernel='pallas' requires a quasi-cyclic code, check_rule='exact', "
            "decode_graph='orig' and an SPA/min-sum variant"
        )
    if schedule == "layered" and not eligible:
        raise ValueError(
            "schedule='layered' requires a quasi-cyclic code, "
            "check_rule='exact', decode_graph='orig' and an SPA/min-sum "
            "variant (base rows are the layers)"
        )
    if int8_msgs and not use_pallas:
        raise ValueError(
            "--msg-store int8 is a Pallas-kernel storage knob: it requires "
            "a configuration the QC kernel accepts (QC code, "
            "check_rule='exact', decode_graph='orig', min-sum variant, "
            "kernel 'auto' on TPU or 'pallas')"
        )
    if use_pallas:
        from ldpc_tpu.ops.spa_pallas import qc_kernel_fits

        if not qc_kernel_fits(code.qc, schedule,
                              track_norm=opts.normalized_llr,
                              msg_store=opts.msg_store):
            if want == "pallas":
                hint = (
                    "; dropping --normalized-llr would free its VMEM scratch"
                    if opts.normalized_llr
                    and qc_kernel_fits(code.qc, schedule, track_norm=False)
                    else ""
                )
                raise ValueError(
                    f"kernel='pallas': {code.name} needs more VMEM than one "
                    "core offers for the QC decode kernel (see "
                    f"spa_pallas.qc_vmem_bytes); use kernel='auto' or 'xla'{hint}"
                )
            if not opts.quiet:
                print(
                    f"QC kernel scratch for {code.name} exceeds the VMEM "
                    "budget; using the XLA decoder"
                )
            use_pallas = False

    layer_groups = resolve_layer_groups(code.qc, opts, schedule)
    if opts.check_every > 1 and not use_pallas:
        raise ValueError(
            "--check-every > 1 is a Pallas decode-loop knob: it requires a "
            "configuration the QC kernel accepts (QC code, "
            "check_rule='exact', decode_graph='orig', SPA/min-sum variant, "
            "kernel 'auto' on TPU or 'pallas')"
        )
    sgroups = 1
    if use_pallas:
        from ldpc_tpu.ops.spa_pallas import qc_kernel_fits as _fits

        sgroups = resolve_sublane_groups(
            code.qc, opts,
            fits=lambda g: _fits(
                code.qc, schedule, track_norm=opts.normalized_llr,
                msg_store=opts.msg_store, sublane_groups=g,
            ),
        )

    def build(iters):
        if use_pallas:
            from ldpc_tpu.ops.spa_pallas import make_qc_decoder, pick_tile_b

            return make_qc_decoder(
                code.qc,
                info_pos,
                iters,
                variant,
                alpha=opts.minsum_alpha,
                beta=opts.minsum_beta,
                tile_b=pick_tile_b(code.qc, schedule=schedule),
                interpret=not on_tpu,
                schedule=schedule,
                # elide the per-iteration normalized-LLR bookkeeping (and
                # its VMEM scratch) when the metric is not requested
                track_norm=opts.normalized_llr,
                msg_store=opts.msg_store,
                layer_groups=layer_groups,
                check_every=opts.check_every,
                sublane_groups=sgroups,
            )
        if schedule == "layered":
            from ldpc_tpu.ops.layered import make_qc_layered_decoder

            return make_qc_layered_decoder(
                code.qc, info_pos, iters, variant,
                alpha=opts.minsum_alpha, beta=opts.minsum_beta,
                # the XLA layered decoder expresses the paired schedule as
                # its flattened serial order (arithmetic-identical)
                layer_order=(
                    None if layer_groups is None
                    else [bi for g in layer_groups for bi in g]
                ),
            )
        return make_decoder(
            layout,
            info_pos,
            iters,
            variant,
            rule=opts.check_rule,
            alpha=opts.minsum_alpha,
            beta=opts.minsum_beta,
        )

    kind = "pallas" if use_pallas else "xla"
    if schedule == "layered":
        kind += "+layered"
    if layer_groups is not None:
        kind += "+paired"
    if opts.check_every > 1:
        kind += f"+ce{opts.check_every}"
    if sgroups > 1:
        kind += f"+sg{sgroups}"
    return build(max_iterations), kind


@dataclass
class PointStats:
    """Host-side aggregate for one SNR point."""

    blocks: int = 0
    ok_blocks: int = 0
    error_bits: int = 0
    fer_frames: int = 0
    norm_llr_sum: float = 0.0
    conv_iters_sum: int = 0
    conv_count: int = 0

    def add(self, c: BlockCounters) -> None:
        self.blocks += int(c.blocks)
        self.ok_blocks += int(c.ok_blocks)
        self.error_bits += int(c.error_bits)
        self.fer_frames += int(c.fer_frames)
        self.norm_llr_sum += float(c.norm_llr_sum)
        self.conv_iters_sum += int(c.conv_iters_sum)
        self.conv_count += int(c.conv_count)


class PointExecutor:
    """One compiled Monte-Carlo step, reusable across every SNR point that
    shares (code, iterations, interleaver, modulation, decoder config)."""

    def __init__(
        self,
        code: LDPCCode,
        opts: SimOptions,
        *,
        max_iterations: int | None = None,
        interleaver: str | None = None,
        modulation: int | None = None,
        mesh: jax.sharding.Mesh | None = None,
        batch_axes: tuple[str, ...] = ("batch",),
        step_vmapped: bool = False,
    ):
        # step_vmapped: the caller will jax.vmap(self._step) (the parallel
        # sweep stacks SNR points); the fused kernel's shard_map wrapper has
        # no batching rule for that composition, so it stays ineligible there
        opts = opts.resolved()
        self.code = code
        self.opts = opts
        self.graph = opts.decode_graph
        self.max_iterations = max_iterations or opts.iterations
        il_kind = interleaver if interleaver is not None else opts.interleaver
        self.modulation = modulation or opts.modulation
        if self.modulation in (4, 16, 64) and opts.noise_model == "legacy":
            raise ValueError(
                "QAM modulations require noise_model='exact' (use --fidelity "
                "exact or --noise-model exact): the legacy sigma^2-as-stddev "
                "quirk is BPSK-specific and would make the SNR axis "
                "incomparable"
            )
        self.batch = opts.auto_batch(code.n)
        self.mesh = mesh
        if mesh is not None:
            # only axes the mesh actually has shard the batch (an snr-only
            # mesh leaves the codeword batch unsharded)
            batch_axes = tuple(a for a in batch_axes if a in mesh.axis_names)
            if batch_axes:
                # round the batch up to a multiple of the sharded axis size
                axis = int(np.prod([mesh.shape[a] for a in batch_axes]))
                self.batch = int(-(-self.batch // axis) * axis)

        spec = code.encode_spec(opts.encoding_method, opts.ru_gap)
        self.spec = spec
        layout = code.layout(self.graph)
        info_pos = spec.info_pos(self.graph)

        # rate adaptation: shorten the LAST S info bits (known zeros at the
        # receiver), puncture the LAST P parity positions (erasures)
        S, P = opts.shorten, opts.puncture
        n_parity = code.n - code.k
        if not 0 <= S < code.k:
            raise ValueError(f"shorten={S} out of range [0, k={code.k})")
        if not 0 <= P < n_parity:
            raise ValueError(f"puncture={P} out of range [0, n-k={n_parity})")
        self.k_active = code.k - S
        self.effective_rate = self.k_active / max(code.n - S - P, 1)
        if (S or P) and abs(opts.speed - self.effective_rate) > 1e-9 and not opts.quiet:
            print(
                f"Note: shorten/puncture give an effective rate of "
                f"{self.effective_rate:.4f} but the Eb/N0 scaling uses "
                f"--speed {opts.speed:g}; pass --speed "
                f"{self.effective_rate:.6g} if the SNR axis should be "
                f"per-info-bit of the adapted code"
            )
        short_pos = np.asarray(info_pos[self.k_active:], dtype=np.int64)
        parity_pos = np.setdiff1d(
            np.arange(code.n, dtype=np.int64), np.asarray(info_pos, np.int64)
        )
        punct_pos = parity_pos[n_parity - P:] if P else np.empty(0, np.int64)
        # decoder/metrics see only the active info bits
        info_pos = np.asarray(info_pos[: self.k_active], dtype=np.int32)
        self._info_pos = jnp.asarray(info_pos)
        u_mask = np.ones((1, code.k), np.float32)
        u_mask[0, self.k_active:] = 0.0
        llr_short = np.zeros((1, code.n), np.float32)
        llr_short[0, short_pos] = 1.0
        llr_punct = np.ones((1, code.n), np.float32)
        llr_punct[0, punct_pos] = 0.0
        _u_mask = jnp.asarray(u_mask)
        _llr_short = jnp.asarray(llr_short)
        _llr_punct = jnp.asarray(llr_punct)
        KNOWN_LLR = 60.0  # |LLR| of a known bit; channel convention: 0 -> negative

        k = code.k
        batch = self.batch
        exact_ber = opts.exact_ber

        # Chunked-dispatch depth: each dispatch over the remote-TPU link
        # pays a ~28 ms serialized submission latency (measured round 5,
        # examples/sublane_fill/binder.json -- it does NOT overlap across
        # dispatches, only with device execution), so a chunk must carry
        # enough device work to amortize it. The flagship (1152, 576) at
        # 64 batches/chunk runs ~85 ms of device work per dispatch
        # (device-bound); a small code at the same 64 runs ~2 ms and is
        # >90% latency -- the round-4 perf matrix's small-code rows
        # measured the TUNNEL, not the kernel. Scale the depth inversely
        # with per-batch work (~ n*k*batch), capped by the int32
        # error-bits counter headroom (worst case k errors per frame).
        work = max(code.n * code.k * batch, 1)
        ref_work = 1152 * 576 * 4096
        cap = max((1 << 31) // max(code.k * batch, 1), 1)
        self._max_chunk_steps = min(
            max(64, 64 * ref_work // work), 4096, cap
        )

        # ---- fully-fused Monte-Carlo step eligibility (ops.mc_pallas) ----
        on_tpu = jax.default_backend() == "tpu"
        schedule = opts.schedule or "flooding"
        noise_source = "hw" if on_tpu else "input"
        fused_eligible = (
            opts.fused != "off"
            and opts.kernel in ("auto", "pallas")  # --kernel xla must win
            and code.qc is not None
            and opts.check_rule == "exact"
            and self.graph in ("orig", "original")
            and opts.decoder_variant in _PALLAS_VARIANTS
            and il_kind == "none"
            and self.modulation in (1, 2)
            and opts.mode in (1, 2, 3)
            and S == 0
            and P == 0
            # under a mesh the kernel runs per-shard via shard_map (needs a
            # batch axis to shard over, and a step the caller won't vmap)
            and (mesh is None or (bool(batch_axes) and not step_vmapped))
        )
        phase1 = resolve_two_phase(opts.two_phase, self.max_iterations,
                                   opts.check_every)
        if phase1 and opts.normalized_llr:
            # two-phase requires checkpoint-exact counters across dispatch
            # modes. Integer counters (error_bits, fer_frames, conv) are
            # bit-exact on hardware, but norm_llr_sum is a device-side f32
            # accumulation whose rounding depends on the compiled program --
            # measured at ~1e-7 relative divergence on TPU
            # (parity_runs/tpu_two_phase.json). So the split is refused when
            # the normalized-LLR metric is tracked.
            if opts.two_phase != "auto":
                raise ValueError(
                    f"--two-phase {opts.two_phase} cannot be combined with "
                    "--normalized-llr: the norm-LLR sum is a float "
                    "accumulator that is not bit-stable across dispatch "
                    "modes (measured on TPU, parity_runs/tpu_two_phase."
                    "json); use --two-phase off"
                )
            phase1 = 0
        phase1_downgraded = False
        if fused_eligible:
            from ldpc_tpu.ops.mc_pallas import mc_kernel_fits

            fused_eligible = mc_kernel_fits(
                code.qc, schedule, noise_source=noise_source, mode=opts.mode,
                track_norm=opts.normalized_llr, msg_store=opts.msg_store,
                emit_llr=bool(phase1),
            )
            if not fused_eligible and phase1 and mc_kernel_fits(
                code.qc, schedule, noise_source=noise_source, mode=opts.mode,
                track_norm=opts.normalized_llr, msg_store=opts.msg_store,
            ):
                # the LLR-emit block alone overflows VMEM: run single-phase
                phase1 = 0
                phase1_downgraded = True
                fused_eligible = True
        if opts.fused == "on" and not fused_eligible:
            raise ValueError(
                "fused='on' requires a QC code, check_rule='exact', "
                "decode_graph='orig', an SPA/min-sum variant, "
                "no interleaver, modulation 1/2, no "
                "shorten/puncture, a mesh with a batch axis (or none) "
                "outside the parallel sweep, and the kernel fitting VMEM "
                "(--normalized-llr adds a scratch buffer to the VMEM plan)"
            )
        use_fused = opts.fused == "on" or (
            opts.fused == "auto" and fused_eligible and on_tpu
        )
        if use_fused and phase1_downgraded and opts.two_phase != "auto":
            # an explicitly requested phase split cannot be honored: say so
            # loudly (mirrors the fused='on' error path) instead of silently
            # running single-phase; 'auto' keeps the silent fallback
            raise ValueError(
                f"--two-phase {opts.two_phase}: the phase-1 LLR-emit output "
                f"block does not fit the VMEM plan for {code.name} "
                "(ops.mc_pallas.mc_vmem_bytes); use --two-phase auto/off"
            )

        if mesh is not None and batch_axes:
            sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(batch_axes)
            )
        else:
            sharding = None

        k_active = self.k_active

        if use_fused:
            from ldpc_tpu.ops.encode import make_encoder_T
            from ldpc_tpu.ops.mc_pallas import (
                DRAWS_PER_BIT,
                consts_vector,
                make_llr_decoder,
                make_mc_decoder,
            )

            encode_T = make_encoder_T(spec, self.graph)
            layer_groups = resolve_layer_groups(code.qc, opts, schedule)
            from ldpc_tpu.ops.mc_pallas import mc_kernel_fits as _mc_fits

            self._sublane_groups = sgroups = resolve_sublane_groups(
                code.qc, opts,
                fits=lambda g: _mc_fits(
                    code.qc, schedule, noise_source=noise_source,
                    mode=opts.mode, track_norm=opts.normalized_llr,
                    msg_store=opts.msg_store, emit_llr=bool(phase1),
                    sublane_groups=g,
                ),
            )
            kernel_kw = dict(
                mode=opts.mode,
                modulation=self.modulation,
                alpha=opts.minsum_alpha,
                beta=opts.minsum_beta,
                schedule=schedule,
                noise_source=noise_source,
                interpret=not on_tpu,
                track_norm=opts.normalized_llr,
                msg_store=opts.msg_store,
                # paired layered sweep: phase 1 and phase 2 share the same
                # flattened layer order, keeping two-phase lane-parity intact
                layer_groups=layer_groups,
                check_every=opts.check_every,
                # sublane grouping applies to BOTH phases (the phase-2 LLR
                # decoder re-groups the compacted lanes the same way)
                sublane_groups=sgroups,
            )
            decode_kw = {
                k: v for k, v in kernel_kw.items()
                if k not in ("mode", "modulation", "noise_source")
            }
            draws = DRAWS_PER_BIT[opts.mode]
            n = code.n

            def build_mc_base(p1: int):
                """Per-batch decode composition at phase-1 split ``p1``
                (0 = single-pass). Counters are bit-identical across p1
                (tests/test_two_phase.py, parity_runs/tpu_two_phase.json),
                so the split is purely a dispatch-cost knob."""
                mc = make_mc_decoder(
                    code.qc, info_pos,
                    p1 or self.max_iterations,
                    opts.decoder_variant,
                    emit_llr=bool(p1),
                    **kernel_kw,
                )
                if not p1:
                    def mc_base(wT, cv, seeds, raw=None, skip=None):
                        if raw is None:
                            return mc(wT, cv, seeds, skip=skip)
                        return mc(wT, cv, seeds, raw, skip=skip)

                    return mc_base

                # phase 2: full-budget re-decode of the frames phase 1 left
                # unconverged, from the exact in-kernel LLR bits -- lane-wise
                # determinism makes the composition bit-identical to a
                # single-pass decode at max_iterations (tests/test_two_phase)
                llr_dec = make_llr_decoder(
                    code.qc, info_pos, self.max_iterations,
                    opts.decoder_variant, **decode_kw,
                )

                def mc_base(wT, cv, seeds, raw=None, skip=None):
                    outs = (
                        mc(wT, cv, seeds, skip=skip) if raw is None
                        else mc(wT, cv, seeds, raw, skip=skip)
                    )
                    err1, ok1, conv1, norm1, it1, llrT = outs
                    # compact unconverged frames to the front lanes: sort
                    # keys are 0 (unconverged) before 1 (converged)
                    order = jnp.argsort(ok1.astype(jnp.int32))
                    llr_s = jnp.take(llrT, order, axis=1)
                    w_s = jnp.take(wT, order, axis=1)
                    done0 = ok1[order].astype(jnp.float32)
                    err2, ok2, conv2, norm2, it2 = llr_dec(llr_s, w_s, done0)

                    def unsort(x):
                        return jnp.zeros_like(x).at[order].set(x)

                    err = jnp.where(ok1, err1, unsort(err2))
                    conv = jnp.where(ok1, conv1, unsort(conv2))
                    norm = jnp.where(ok1, norm1, unsort(norm2))
                    ok = ok1 | unsort(ok2)
                    # decode work per frame: phase trips ADD (a re-decoded
                    # frame's tile executed it1 + it2 loop trips). Boundary
                    # tiles mix converged and re-decoded lanes, so a
                    # phase-1-converged frame can inherit its phase-2 tile's
                    # trips -- a <=1-tile overcount; the max/sum consumers
                    # (fused_step, total_iters_run) want the pessimistic one.
                    iters = it1 + unsort(it2)
                    return err, ok, conv, norm, iters

                return mc_base

            def build_fused(p1: int):
                """(step, chunk) jitted dispatch pair at phase-1 split ``p1``
                (jit is lazy: an unused pair costs nothing until called)."""
                mc_base = build_mc_base(p1)
                mc_call = mc_base
                if mesh is not None and batch_axes:
                    # pallas_call is opaque to XLA's SPMD partitioner, so the
                    # mesh path runs the kernel under shard_map: every device
                    # decodes its own batch shard with a local kernel instance
                    # and counters psum afterwards (XLA inserts the collectives
                    # from the sharded [B] outputs). 'hw' noise folds the
                    # linearized shard index into the seed so shards draw
                    # independent streams; 'input' noise consumes the shard's
                    # slice of the global draw tensor, so meshed and unmeshed
                    # fused runs are bit-identical (tests/test_sharding.py).
                    PS = jax.sharding.PartitionSpec
                    axis_sizes = [int(mesh.shape[a]) for a in batch_axes]

                    def _shard_seeds(seeds):
                        idx = jnp.int32(0)
                        for a, s in zip(batch_axes, axis_sizes):
                            idx = idx * s + jax.lax.axis_index(a)
                        # Weyl-mix into the SECOND seed word (the kernel mixes
                        # the tile index into the first); int32 wrap intended
                        return seeds.at[1].add(idx * jnp.int32(-1640531527))

                    def _local(wT, cv, seeds, raw, skip):
                        # two-phase compaction (mc_base) stays INSIDE the
                        # shard: each device sorts and re-decodes its own
                        # batch shard
                        if noise_source == "hw":
                            seeds = _shard_seeds(seeds)
                            return mc_base(wT, cv, seeds, skip=skip)
                        return mc_base(wT, cv, seeds, raw, skip=skip)

                    raw_spec = (
                        PS() if noise_source == "hw"
                        else PS(None, None, batch_axes)
                    )
                    sharded_mc = jax.shard_map(
                        _local,
                        mesh=mesh,
                        in_specs=(PS(None, batch_axes), PS(), PS(), raw_spec,
                                  PS()),
                        out_specs=(PS(batch_axes),) * 5,
                        # outputs vary only over the batch axes (shards along
                        # any other mesh axis see identical inputs and seeds);
                        # the kernel is opaque to the varying-axes checker
                        check_vma=False,
                    )

                    def mc_call(wT, cv, seeds, raw=None, skip=None):
                        if raw is None:
                            raw = jnp.zeros((), jnp.uint32)  # unused ('hw')
                        if skip is None:
                            skip = jnp.zeros((), jnp.int32)
                        return sharded_mc(wT, cv, seeds, raw, skip)

                def fused_step(key: jax.Array, consts: ChannelConsts,
                               skip: jax.Array | None = None):
                    k_u, k_noise = jax.random.split(key)
                    u = random_info_bits(k_u, batch, k)
                    if sharding is not None:
                        u = jax.lax.with_sharding_constraint(u, sharding)
                    wT = encode_T(u)
                    cv = consts_vector(consts)
                    if noise_source == "hw":
                        seeds = jax.lax.bitcast_convert_type(
                            jax.random.bits(k_noise, (2,), jnp.uint32),
                            jnp.int32,
                        )
                        err, ok, conv, norm, it_l = mc_call(wT, cv, seeds,
                                                            skip=skip)
                    else:
                        seeds = jnp.zeros((2,), jnp.int32)
                        raw = jax.random.bits(
                            k_noise, (draws, n, batch), jnp.uint32
                        )
                        err, ok, conv, norm, it_l = mc_call(wT, cv, seeds,
                                                            raw, skip=skip)
                    if not exact_ber:
                        # reference: bits counted only when decode failed
                        # (main.py:134); in-kernel err counts every frame
                        err = jnp.where(ok, 0, err)
                    stats = BlockStats(
                        error_bits=err, ok=ok, conv_iter=conv, norm_llr=norm
                    )
                    return stats, jnp.max(it_l)

                # Chunked dispatch: scan CHUNK_STEPS Monte-Carlo steps inside
                # ONE jitted program, reducing counters on device -- per-
                # dispatch host latency (the remote-TPU-tunnel floor)
                # amortizes over the chunk. Safe here because the fused
                # kernel is opaque to XLA: the pathological
                # while-loop+reduction compile blowup (see the NOTE in
                # make_step) does not apply to pallas_call outputs.
                def fused_chunk(key_point: jax.Array, start_idx: jax.Array,
                                consts: ChannelConsts, n_steps: int):
                    # keys derived IN-JIT: a host-side fold_in per chunk
                    # would cost one tunnel round-trip each (the very
                    # latency the chunking amortizes)
                    keys = jax.vmap(
                        lambda j: jax.random.fold_in(key_point, j)
                    )(start_idx + jnp.arange(n_steps))

                    def body(tot, key):
                        stats, it = fused_step(key, consts)
                        c = reduce_block_stats(
                            stats, jnp.ones((batch,), bool)
                        )
                        return tot + c, it

                    tot, its = jax.lax.scan(body, BlockCounters.zeros(), keys)
                    # one int32[8] output -> ONE host fetch per dispatch
                    # group (leaf-by-leaf fetches cost a round trip each)
                    return pack_counters(tot, jnp.sum(its))

                return (jax.jit(fused_step),
                        jax.jit(fused_chunk, static_argnums=3))

            self._kernel_base = "pallas+fused" + (
                "+layered" if schedule == "layered" else ""
            ) + ("+paired" if layer_groups is not None else "") + (
                f"+ce{opts.check_every}" if opts.check_every > 1 else ""
            ) + (f"+sg{sgroups}" if sgroups > 1 else "") + (
                "+mesh" if mesh is not None and batch_axes else ""
            )
            if phase1 and opts.two_phase == "auto":
                # operating-point-aware dispatch: build BOTH pairs; each SNR
                # point is probed with one single-pass batch and the cheaper
                # mode (predicted from the probe's per-frame convergence
                # iterations -- see _decide_two_phase) runs the rest
                self._step, self._chunk = build_fused(0)
                self._step2, self._chunk2 = build_fused(phase1)
                self._phase1_auto = phase1
                self._two_phase_choice: dict[float, bool] = {}
                # per-sweep tile time estimate for the probe's cost model:
                # this code's census element-ops per sweep x the tile's
                # lanes, at the flagship's measured sustained VPU rate
                # (examples/roofline: 1.87 T element-ops/s)
                from ldpc_tpu.analysis.roofline import decode_census

                per_iter = decode_census(
                    code.qc, opts.decoder_variant, schedule,
                    track_norm=opts.normalized_llr,
                    check_every=opts.check_every,
                    sublane_groups=sgroups,
                ).total()
                self._trip_time_us = max(
                    per_iter * 128 * sgroups / 1.87e12 * 1e6, 1e-3
                )
                self.kernel_used = self._kernel_base + "+2phase(auto)"
            else:
                self._step, self._chunk = build_fused(phase1)
                self.kernel_used = self._kernel_base + (
                    f"+2phase({phase1})" if phase1 else ""
                )
        else:
            self._build_unfused(
                code, opts, layout, info_pos, spec, il_kind, sharding,
                S, P, _u_mask, _llr_punct, _llr_short, KNOWN_LLR,
            )
        def reduce(stats, valid_count: jax.Array) -> BlockCounters:
            valid = jnp.arange(batch) < valid_count
            return reduce_block_stats(stats, valid)

        self._reduce = jax.jit(reduce)
        self._reduce_packed = jax.jit(
            lambda stats, valid_count, iters: pack_counters(
                reduce(stats, valid_count), iters
            )
        )
        self._consts_cache: dict[float, ChannelConsts] = {}
        self.total_iters_run = 0

    def _build_unfused(
        self, code, opts, layout, info_pos, spec, il_kind, sharding,
        S, P, _u_mask, _llr_punct, _llr_short, KNOWN_LLR,
    ):
        """Unfused pipeline: XLA encode/channel around the decode kernel."""
        k = code.k
        batch = self.batch
        exact_ber = opts.exact_ber
        k_active = self.k_active
        encode = make_encoder(spec, self.graph)
        interleave, deinterleave = make_interleaver(
            il_kind, code.n, s_param=opts.s_param, seed=opts.seed
        )
        channel = make_channel_fn(opts.mode, self.modulation, n=code.n)
        decode, self.kernel_used = _select_decoder(
            code, opts, layout, info_pos, self.max_iterations, batch=self.batch
        )

        def make_step(dec, patterns: bool = False):
            def step(key: jax.Array, consts: ChannelConsts,
                     skip: jax.Array | None = None):
                k_u, k_il, k_ch = jax.random.split(key, 3)
                u = random_info_bits(k_u, batch, k)
                if S:
                    u = (u.astype(jnp.float32) * _u_mask).astype(u.dtype)
                if sharding is not None:
                    u = jax.lax.with_sharding_constraint(u, sharding)
                w = encode(u)
                w_int, il_state = interleave(k_il, w)
                llr = channel(k_ch, w_int, consts)
                llr = deinterleave(il_state, llr)
                if P:  # punctured parity bits arrive as erasures
                    llr = llr * _llr_punct
                if S:  # shortened info bits are known zeros
                    llr = llr * (1.0 - _llr_short) - KNOWN_LLR * _llr_short
                res = dec(llr, skip=skip)
                # NOTE: per-codeword stats stay unreduced here -- reducing
                # while-loop outputs to scalars in the same XLA program costs
                # minutes of compile time; the reduction runs in _reduce below.
                stats = block_stats(
                    u[:, :k_active], res, self._info_pos, exact=exact_ber
                )
                if patterns:
                    # residual error vector over the whole codeword: w is a
                    # valid codeword, so H @ resid == H @ est -- the support
                    # of a detected failure is a trapping-set candidate
                    # (ldpc_tpu.analysis.failures.trapping_census)
                    resid = res.est ^ w.astype(res.est.dtype)
                    return stats, res.iters_run, resid
                return stats, res.iters_run

            return step

        self._step = jax.jit(make_step(decode))
        # residual-pattern step for failure analysis, compiled only if used
        self._pattern_step_builder = lambda: jax.jit(make_step(decode, True))

    # Two-phase dispatch overhead -- the [n, B] LLR emit + argsort + two
    # [n, B] gathers + the second kernel launch -- in MICROSECONDS per
    # 128-lane tile. Calibrated on the flagship envelope
    # (examples/two_phase_envelope, round-3 serial and round-4 paired+ce2
    # runs): the implied overhead brackets at ~0.2-2.9 flagship sweeps;
    # the conservative 2.0-sweep choice x the flagship's ~5.2 us/sweep
    # tile time (76k census element-ops/frame x 128 lanes / the 1.87 T
    # op/s sustained rate) = ~10.4 us. Expressed in time rather than trip
    # units because a "trip" shrinks with the code: pricing the SAME
    # dispatch overhead at a small code's tiny trips made the round-4
    # model predict splits that measured 22% SLOWER on CCSDS n32
    # (examples/sublane_fill) -- the overhead does not shrink with the
    # kernel.
    TWO_PHASE_OVERHEAD_US = 10.4

    def _decide_two_phase(self, conv: np.ndarray, ok: np.ndarray) -> bool:
        """Predict whether two-phase dispatch beats single-pass at this
        operating point, from ONE probe batch's per-frame convergence
        iterations (single-pass and two-phase counters are bit-identical,
        so the probe batch itself is consumed as production output).

        Cost model (:func:`two_phase_trip_model`), in mean loop trips per
        kernel tile (128 lanes, or sublane_groups*128 under grouping --
        the grouped kernel's exit couples all G*128 of a tile's
        codewords): two-phase wins when phase1_mean + phase2_per_tile +
        overhead/trip_time < single, with this code's per-sweep tile time
        estimated from its op census at the flagship's sustained rate.
        """
        m = two_phase_trip_model(
            conv, ok, self._phase1_auto, self.max_iterations,
            lanes=128 * getattr(self, "_sublane_groups", 1),
        )
        overhead_trips = self.TWO_PHASE_OVERHEAD_US / self._trip_time_us
        mean_two = (m["phase1_mean"] + m["phase2_per_tile"]
                    + overhead_trips)
        return mean_two < m["single"]

    def run_point(
        self, snr_db: float, blocks: int, base_key: jax.Array, point_index: int
    ) -> PointStats:
        """Stream Monte-Carlo batches for one SNR point."""
        opts = self.opts
        consts = self._consts_cache.get(snr_db)
        if consts is None:
            # one host->device transfer set per SNR point: each scalar costs
            # a round-trip on remote-TPU links, so cache across revisits
            consts = ChannelParams(
                mode=opts.mode,
                modulation=self.modulation,
                speed=opts.speed,
                snr_db=snr_db,
                interference_snr_db=opts.interference_snr,
                p=opts.p,
                noise_model=opts.noise_model,
            ).consts()
            self._consts_cache[snr_db] = consts
        key_point = jax.random.fold_in(base_key, point_index)

        stats = PointStats()
        remaining = blocks
        batch_idx = 0
        target_errors = self.opts.target_errors
        # fused path: consume full batches CHUNK at a time in one dispatch
        # (key folding matches the single-step stream, so chunked and
        # unchunked runs produce identical counters)
        chunk_fn = getattr(self, "_chunk", None)
        step = self._step
        p1_auto = getattr(self, "_phase1_auto", 0)
        if p1_auto and remaining > 0:
            use2 = self._two_phase_choice.get(snr_db)
            if use2 is None:
                # probe this operating point with ONE single-pass batch
                # (consumed as production output -- counters are identical
                # across dispatch modes), then pick the cheaper mode for
                # the rest of the point from its per-frame convergence
                take = min(remaining, self.batch)
                key = jax.random.fold_in(key_point, batch_idx)
                block, iters_run = step(key, consts)
                conv = np.asarray(block.conv_iter)[:take]
                okv = np.asarray(block.ok)[:take]
                counters, iters = unpack_counters(
                    self._reduce_packed(block, jnp.int32(take), iters_run)
                )
                stats.add(counters)
                self.total_iters_run += iters
                remaining -= take
                batch_idx += 1
                use2 = self._decide_two_phase(conv, okv)
                self._two_phase_choice[snr_db] = use2
            self.kernel_used = self._kernel_base + (
                f"+2phase(auto:{p1_auto})" if use2 else "+2phase(auto:off)"
            )
            if use2:
                chunk_fn, step = self._chunk2, self._step2
        # One dispatch covers up to _max_chunk_steps Monte-Carlo batches
        # (an in-program lax.scan): per-dispatch host/tunnel latency
        # amortizes over the whole group. With --target-errors the quota
        # check needs a sync per group, so groups stay small to keep the
        # stop responsive.
        max_chunk = 8 if target_errors else self._max_chunk_steps
        pending = []  # device-side counters: converted AFTER the dispatch
        # loop so groups pipeline through the (high-latency) device link
        while (
            chunk_fn is not None
            and remaining >= self.batch * 2
            and not (target_errors and stats.fer_frames >= target_errors)
        ):
            # round the group size DOWN to a power of two: n_steps is a
            # static jit argument, so each distinct n compiles its own
            # scan-of-n program -- this bounds the program count at
            # log2(max_chunk) while the single-step loop absorbs the tail
            n = min(remaining // self.batch, max_chunk)
            n = 1 << (n.bit_length() - 1)
            packed = chunk_fn(key_point, jnp.int32(batch_idx), consts, n)
            if target_errors:
                counters, iters = unpack_counters(packed)
                stats.add(counters)
                self.total_iters_run += iters
            else:
                pending.append(packed)
            remaining -= self.batch * n
            batch_idx += n
        for packed in pending:
            counters, iters = unpack_counters(packed)
            stats.add(counters)
            self.total_iters_run += iters
        if target_errors and stats.fer_frames >= target_errors:
            remaining = 0
        while remaining > 0:
            take = min(remaining, self.batch)
            key = jax.random.fold_in(key_point, batch_idx)
            block, iters_run = step(key, consts)
            counters, iters = unpack_counters(
                self._reduce_packed(block, jnp.int32(take), iters_run)
            )
            stats.add(counters)
            self.total_iters_run += iters
            remaining -= take
            batch_idx += 1
            # sequential MC early stop: the FER/BER estimators' precision is
            # set by the error count, so once enough frame errors are in,
            # further blocks at this point add nothing
            if target_errors and stats.fer_frames >= target_errors:
                break
        return stats


def snr_steps(initial: float, end: float, step: float) -> list[float]:
    """SNR grid with the reference's stepping (main.py:193, 206-209).

    Validated (step > 0, end >= initial) and de-duplicated: the reference's
    ceil + clamp construction repeats the end point when (end-initial)/step
    is an exact multiple that float division rounds up.
    """
    if step <= 0:
        raise ValueError(f"step_snr must be positive, got {step}")
    if end < initial:
        raise ValueError(
            f"end_snr ({end}) must be >= initial_snr ({initial})"
        )
    num_steps = int(math.ceil((end - initial) / step)) + 1
    values: list[float] = []
    for i in range(num_steps):
        snr = min(initial + i * step, end)
        if not values or snr != values[-1]:
            values.append(snr)
    return values


def build_point_result(
    snr_db: float,
    stats: PointStats,
    opts: SimOptions,
    k: int,
    *,
    matrix_path: str | None = None,
    modulation: int | None = None,
    max_iterations: int | None = None,
    interleaver: str | None = None,
) -> SNRPointResult:
    """Aggregate counters into an SNRPointResult with the reference's
    averaging semantics (main.py:346-389)."""
    blocks = stats.blocks
    avg_ber = 0.0
    avg_fer = 0.0
    avg_llr = 0.0
    if opts.ber and blocks > 0 and k > 0:
        avg_ber = stats.error_bits / (k * blocks)
    if opts.fer and blocks > 0:
        avg_fer = stats.fer_frames / blocks
    if opts.normalized_llr and blocks > 0:
        avg_llr = stats.norm_llr_sum / blocks
    avg_conv = stats.conv_iters_sum / stats.conv_count if stats.conv_count else 0.0
    return SNRPointResult(
        snr_db=snr_db,
        ber=avg_ber,
        fer=avg_fer,
        avg_normalized_llr=avg_llr,
        total_blocks=blocks,
        successful_blocks=stats.ok_blocks,
        failed_blocks=blocks - stats.ok_blocks,
        avg_convergence_iterations=avg_conv,
        matrix_path=matrix_path if matrix_path is not None else opts.matrix,
        modulation=modulation if modulation is not None else opts.modulation,
        max_iterations=max_iterations if max_iterations is not None else opts.iterations,
        interleaver=interleaver if interleaver is not None else opts.interleaver,
        encoding_method=opts.encoding_method,
    )


def make_sim_config(opts: SimOptions, code: LDPCCode) -> SimulationConfig:
    dev = jax.devices()[0]
    return SimulationConfig(
        matrix_path=opts.matrix,
        n=code.n,
        m=code.m,
        k=code.k,
        rate=code.rate,
        blocks=opts.blocks,
        max_iterations=opts.iterations,
        encoding_method=opts.encoding_method,
        interleaver_type=opts.interleaver,
        decoder_type=opts.decoder,
        channel_mode=opts.mode,
        modulation=opts.modulation,
        speed=opts.speed,
        snr_range=(opts.initial_snr, opts.end_snr, opts.step_snr),
        threads=opts.threads,
        timestamp=datetime.now().isoformat(),
        interference_snr=opts.interference_snr,
        p=opts.p,
        fidelity=opts.fidelity,
        decode_graph=opts.decode_graph or "",
        check_rule=opts.check_rule or "",
        noise_model=opts.noise_model or "",
        batch=opts.batch,
        seed=opts.seed,
        device=f"{dev.platform}:{getattr(dev, 'device_kind', '')}x{jax.device_count()}",
        shorten=opts.shorten,
        puncture=opts.puncture,
        schedule=opts.schedule,
        s_param=opts.s_param,
        exact_ber=opts.exact_ber,
        adaptive=opts.adaptive,
        fused=opts.fused,
        layer_order=opts.layer_order,
        check_every=opts.check_every,
        sublane_groups=str(opts.sublane_groups),
    )


def sweep_fingerprint(config: SimulationConfig) -> tuple:
    """Sweep-defining identity of a run: a checkpoint resumes only a sweep
    with identical code / stats / decoder configuration (timestamp, device,
    and wall clock are excluded)."""
    return (
        config.matrix_path, config.n, config.m, config.k,
        config.blocks, config.max_iterations, config.encoding_method,
        config.interleaver_type, config.decoder_type, config.channel_mode,
        config.modulation, config.speed, tuple(config.snr_range),
        config.interference_snr, config.p, config.fidelity,
        config.decode_graph, config.check_rule, config.noise_model,
        config.seed, config.shorten, config.puncture, config.schedule,
        config.s_param, config.exact_ber, config.adaptive, config.fused,
        # a reordered layered sweep is a different decode schedule with
        # different statistics (unlike two_phase below); a gated syndrome
        # cadence coarsens convergence detection, likewise
        config.layer_order, config.check_every,
        # sublane grouping changes the hw-PRNG draw geometry (a G>1 tile
        # draws [G*Z, 128] planes), so G>1 runs are a different noise
        # stream than G=1 on hardware; the option string is stable for a
        # fixed sweep ('auto' resolves deterministically from the code)
        config.sublane_groups,
        # batch shapes the key->codeword stream (keys fold per batch index),
        # so a different batch size is a DIFFERENT sweep, not a resumable one
        config.batch,
        # two_phase is deliberately ABSENT: it is a dispatch knob with
        # bit-identical counters -- proven in interpret mode
        # (tests/test_two_phase.py) AND on hardware across separately
        # compiled kernels (parity_runs/tpu_two_phase.json). The one
        # non-bit-stable statistic, the f32 norm_llr_sum accumulator, is
        # excluded by construction: the executor refuses the split when
        # --normalized-llr is tracked.
    )


def load_checkpoint(
    opts: SimOptions, config: SimulationConfig, say
) -> SimulationResult | None:
    """Prior partial result from opts.checkpoint, or None when absent/foreign."""
    import os

    if not (opts.checkpoint and opts.resume and os.path.exists(opts.checkpoint)):
        return None
    prior = SimulationResult.from_json(opts.checkpoint)
    if sweep_fingerprint(prior.config) != sweep_fingerprint(config):
        say(
            f"Checkpoint {opts.checkpoint} belongs to a different sweep "
            f"configuration; starting fresh."
        )
        return None
    say(f"Resuming from {opts.checkpoint}: {len(prior.snr_points)} points done")
    return prior


def _parallel_ckpt_save(
    path: str, fp, batch_idx: int, remaining: int, stats_list, total_iters: int,
    device_batch: int,
) -> None:
    """Atomic mid-sweep checkpoint for the parallel runner: raw per-point
    counters + stream position. PRNG keys fold by (point, batch) index, so a
    resumed sweep is BIT-IDENTICAL to an uninterrupted one -- provided the
    RESOLVED device batch matches (batch=0 auto-resolves per device count),
    hence it is recorded and checked alongside the fingerprint."""
    import json

    payload = {
        "parallel_sweep": 1,
        "fingerprint": fp,
        "device_batch": device_batch,
        "batch_idx": batch_idx,
        "remaining": remaining,
        "total_iters_run": total_iters,
        "counters": [
            [s.blocks, s.ok_blocks, s.error_bits, s.fer_frames,
             s.norm_llr_sum, s.conv_iters_sum, s.conv_count]
            for s in stats_list
        ],
    }
    import os

    tmp = f"{path}.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def _parallel_ckpt_load(path: str, fp, n_points: int, say, device_batch: int):
    """Load a parallel-sweep checkpoint; None when absent/foreign."""
    import json
    import os

    if not os.path.exists(path):
        return None
    with open(path, "r", encoding="utf-8") as f:
        d = json.load(f)
    if not d.get("parallel_sweep"):
        say(f"Checkpoint {path} is not a parallel-sweep checkpoint; "
            "starting fresh.")
        return None
    if (d["fingerprint"] != fp or len(d["counters"]) != n_points
            or d.get("device_batch") != device_batch):
        say(f"Checkpoint {path} belongs to a different sweep configuration; "
            "starting fresh.")
        return None
    stats_list = []
    for row in d["counters"]:
        s = PointStats()
        (s.blocks, s.ok_blocks, s.error_bits, s.fer_frames,
         s.norm_llr_sum, s.conv_iters_sum, s.conv_count) = row
        stats_list.append(s)
    say(f"Resuming parallel sweep from {path}: batch {d['batch_idx']}, "
        f"{d['remaining']} blocks/point remaining")
    return d["batch_idx"], d["remaining"], d["total_iters_run"], stats_list


def _profiled_sweep(profile_dir: str | None):
    """jax.profiler trace around the sweep when --profile is set."""
    import contextlib

    if profile_dir:
        return jax.profiler.trace(profile_dir)
    return contextlib.nullcontext()


def run_simulation(
    opts: SimOptions,
    code: LDPCCode | None = None,
    mesh: jax.sharding.Mesh | None = None,
) -> SimulationResult:
    """Full SNR sweep; returns a SimulationResult (main.py:178-442 analogue)."""
    opts = opts.resolved()
    start_time = time.time()
    if code is None:
        code = load_code(opts.matrix)

    base_key = jax.random.key(opts.seed)
    say = (lambda *a, **kw: None) if opts.quiet else print
    config = make_sim_config(opts, code)
    prior = load_checkpoint(opts, config, say)
    snr_points: list[SNRPointResult] = list(prior.snr_points) if prior else []

    # executor construction (GF(2) elimination, decoder build) is deferred:
    # a checkpoint that already covers the whole sweep skips it entirely
    executor: PointExecutor | None = None

    say("Processing blocks across SNR points...")
    say("-" * 60)

    with _profiled_sweep(opts.profile):
        for idx, snr in enumerate(
            snr_steps(opts.initial_snr, opts.end_snr, opts.step_snr)
        ):
            if idx < len(snr_points):
                continue  # completed before resume
            if executor is None:
                executor = PointExecutor(code, opts, mesh=mesh)
            say(f"\nSNR: {snr:.2f} dB")
            t_point = time.time()
            stats = executor.run_point(snr, opts.blocks, base_key, idx)
            point_s = time.time() - t_point
            point = build_point_result(snr, stats, opts, executor.k_active)
            snr_points.append(point)
            if opts.normalized_llr:
                say(f"  Normalized LLR: {point.avg_normalized_llr:.6f}")
            if opts.fer:
                say(f"  FER: {point.fer:.6f}")
            if opts.ber:
                say(f"  BER: {point.ber:.6f}")
            say(
                f"  Decoded OK: {point.successful_blocks}/{point.total_blocks} "
                f"({100.0 * point.successful_blocks / max(point.total_blocks, 1):.2f}%)"
            )
            say(
                f"  Throughput: {stats.blocks / point_s:,.0f} codewords/s "
                f"({stats.blocks * code.k / point_s:,.0f} info bits/s)"
            )
            if opts.checkpoint:
                SimulationResult(
                    config=config,
                    snr_points=snr_points,
                    wall_clock_seconds=time.time() - start_time,
                ).to_json(opts.checkpoint)

    say()
    say("=" * 60)
    if opts.ber:
        say("SNR -> BER:")
        for p in snr_points:
            say(f"  {p.snr_db:.2f} dB -> {p.ber:.6f}")
    if opts.fer:
        say("SNR -> FER:")
        for p in snr_points:
            say(f"  {p.snr_db:.2f} dB -> {p.fer:.6f}")
    if opts.normalized_llr:
        say("SNR -> Normalized LLR:")
        for p in snr_points:
            say(f"  {p.snr_db:.2f} dB -> {p.avg_normalized_llr:.6f}")
    say("=" * 60)

    return SimulationResult(
        config=config,
        snr_points=snr_points,
        wall_clock_seconds=time.time() - start_time,
    )


def run_simulation_parallel(
    opts: SimOptions,
    code: LDPCCode | None = None,
    mesh: jax.sharding.Mesh | None = None,
    snr_axis: str = "snr",
) -> SimulationResult:
    """SNR sweep with every point evaluated SIMULTANEOUSLY on the mesh.

    The mesh carries ('snr', 'batch'): independent SNR points vectorize over
    the 'snr' axis (vmap over stacked ChannelConsts) while each point's
    codeword batch stays data-parallel over 'batch'. One jitted program
    evaluates S points x B codewords per dispatch; counters psum on device.

    PRNG keys fold exactly as the sequential runner's
    (fold(fold(base, point_index), batch_index)), so this produces the SAME
    SimulationResult as run_simulation -- the TPU-native answer to the
    reference's sequential SNR loop (main.py:206).
    """
    from ldpc_tpu.parallel.mesh import make_mesh, sharded_sweep_step

    opts = opts.resolved()
    start_time = time.time()
    if code is None:
        code = load_code(opts.matrix)
    if mesh is None:
        mesh = make_mesh()  # all devices on 'batch'
    say = (lambda *a, **kw: None) if opts.quiet else print

    snrs = snr_steps(opts.initial_snr, opts.end_snr, opts.step_snr)
    S = len(snrs)
    s_shard = int(mesh.shape[snr_axis]) if snr_axis in mesh.axis_names else 1
    Sp = -(-S // s_shard) * s_shard  # pad points to the snr-axis size

    batch_axes = tuple(a for a in mesh.axis_names if a != snr_axis)
    executor = PointExecutor(
        code, opts, mesh=mesh, batch_axes=batch_axes or ("batch",),
        step_vmapped=True,
    )
    base_key = jax.random.key(opts.seed)

    def consts_for(snr_db: float) -> ChannelConsts:
        return ChannelParams(
            mode=opts.mode,
            modulation=opts.modulation,
            speed=opts.speed,
            snr_db=snr_db,
            interference_snr_db=opts.interference_snr,
            p=opts.p,
            noise_model=opts.noise_model,
        ).consts()

    padded = snrs + [snrs[-1]] * (Sp - S)
    consts_stack = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[consts_for(s) for s in padded]
    )
    point_keys = jnp.stack(
        [jax.random.fold_in(base_key, i) for i in range(Sp)]
    )

    if snr_axis in mesh.axis_names:
        sweep = sharded_sweep_step(
            lambda k, c, s: executor._step(k, c, s), mesh, snr_axis
        )
    else:
        sweep = jax.jit(jax.vmap(lambda k, c, s: executor._step(k, c, s)))
    reduce_v = jax.jit(jax.vmap(executor._reduce, in_axes=(0, None)))

    say(f"Evaluating {S} SNR points in parallel on mesh "
        f"{dict(zip(mesh.axis_names, mesh.devices.shape))}...")

    stats_list = [PointStats() for _ in range(Sp)]
    remaining = opts.blocks
    batch_idx = 0
    ckpt_fp = None
    if opts.checkpoint:
        import json as _json

        # JSON-normalized so a reloaded fingerprint compares equal
        ckpt_fp = _json.loads(
            _json.dumps(sweep_fingerprint(make_sim_config(opts, code)))
        )
        if opts.resume:
            prior = _parallel_ckpt_load(opts.checkpoint, ckpt_fp, Sp, say,
                                        executor.batch)
            if prior is not None:
                batch_idx, remaining, executor.total_iters_run, stats_list = prior
    def finished_mask() -> np.ndarray:
        """Points that stop decoding: padding replicas always; real points
        once they reach the --target-errors frame quota (the sequential
        runner's per-point early stop, applied per point here instead of
        letting finished points burn iterations until the slowest one is
        done). Derived from stats_list, so checkpoint resume recomputes it.
        """
        f = np.zeros(Sp, dtype=bool)
        f[S:] = True
        if opts.target_errors:
            for s in range(S):
                f[s] = stats_list[s].fer_frames >= opts.target_errors
        return f

    with _profiled_sweep(opts.profile):
        while remaining > 0:
            finished = finished_mask()
            # stop once EVERY real point has its frame-error quota (also
            # catches a resume from an already-finished checkpoint)
            if opts.target_errors and finished[:S].all():
                break
            take = min(remaining, executor.batch)
            keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                point_keys, batch_idx
            )
            skips = jnp.asarray(finished.astype(np.int32))
            stats, iters_run = sweep(keys, consts_stack, skips)
            counters = reduce_v(stats, jnp.int32(take))
            host = jax.tree.map(np.asarray, counters)
            for s in range(Sp):
                if not finished[s]:
                    stats_list[s].add(jax.tree.map(lambda x: x[s], host))
            # sum per-point iteration counts over the points still decoding
            # (same meaning as the sequential runner's accumulation, one
            # count per dispatched SNR point)
            executor.total_iters_run += int(
                np.sum(np.asarray(iters_run)[~finished])
            )
            remaining -= take
            batch_idx += 1
            if opts.checkpoint:
                _parallel_ckpt_save(
                    opts.checkpoint, ckpt_fp, batch_idx, remaining,
                    stats_list, executor.total_iters_run, executor.batch,
                )

    snr_points = [
        build_point_result(snrs[s], stats_list[s], opts, executor.k_active)
        for s in range(S)
    ]
    for p in snr_points:
        say(f"SNR {p.snr_db:.2f} dB: BER={p.ber:.6f} FER={p.fer:.6f} "
            f"ok={p.successful_blocks}/{p.total_blocks}")

    return SimulationResult(
        config=make_sim_config(opts, code),
        snr_points=snr_points,
        wall_clock_seconds=time.time() - start_time,
    )
