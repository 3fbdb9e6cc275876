"""Learned per-iteration normalized-min-sum weight schedules.

In JAX the decoder is a differentiable function of its check-update
weights, so the framework can optimize the decoder itself -- the central
idea of neural/weighted min-sum decoding (Nachmani et al. 2017,
arXiv:1701.05931; degree-specific weights, arXiv:2107.04221). This module
learns a per-iteration schedule ``alpha[t]`` for the normalized min-sum
decoder by unrolling T iterations with no early exit (gradients flow
through every iteration), generating fresh channel noise each optimizer
step, and minimizing the multiloss sigmoid BCE between every iteration's
posterior and the transmitted codeword.

The reference simulator cannot express any of this: its decoder is an
imperative per-edge Python loop (spa_decoder.py). Here train and inference
share one forward: the unrolled decoder uses ops.spa.minsum_excl_update,
and ops.spa.make_decoder accepts the learned vector directly via
``alpha=alphas`` (variant='normalized_minsum', applied as
``alpha[min(it, T-1)]``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_tpu.ops.spa import check_degree_classes, minsum_excl_update


def make_unrolled_minsum(layout, iters: int, dtype=jnp.float32,
                         per_degree: bool = False):
    """Differentiable unrolled normalized min-sum (exact rule, orig graph).

    Returns ``posteriors(alphas, llr [B, n]) -> [T, B, n]`` posteriors
    in the log(p0/p1) domain (bit = 1 <=> L < 0), one per iteration; alphas
    is [T], or [T, D] with ``per_degree=True`` (D = distinct check degrees
    ascending, ops.spa.check_degree_classes). Input LLRs use the channel
    convention LLR > 0 <=> bit 1. No early exit and no hard decisions
    inside -- every operation is differentiable (the min and sign factors
    are piecewise differentiable, as in all neural min-sum work).
    """
    n, m, dc = layout.n, layout.m, layout.dc
    chk_var = jnp.asarray(layout.chk_var)  # [m, dc] pad = n
    var_edge = jnp.asarray(layout.var_edge)  # [n, dv] pad = m*dc
    slot_valid = jnp.asarray(layout.chk_var < layout.n)
    deg_idx = (
        jnp.asarray(check_degree_classes(layout)[0]) if per_degree else None
    )

    def posteriors(alphas: jax.Array, llr: jax.Array) -> jax.Array:
        lc = -llr.astype(dtype)  # exact rule: log(p0/p1) domain
        B = lc.shape[0]
        lc_pad = jnp.pad(lc, ((0, 0), (0, 1)))  # sentinel var n -> 0
        M = jnp.take(lc_pad, chk_var, axis=1)  # [B, m, dc]
        outs = []
        for t in range(iters):
            sgn, mag = minsum_excl_update(M, slot_valid, dtype)
            a_t = (
                alphas[t][deg_idx][None, :, None] if per_degree
                else alphas[t]
            )
            E = sgn * (a_t * mag)
            E = jnp.where(slot_valid, E, jnp.zeros((), dtype))
            E_flat = jnp.pad(E.reshape(B, m * dc), ((0, 0), (0, 1)))
            L = lc + jnp.sum(jnp.take(E_flat, var_edge, axis=1), axis=-1)
            outs.append(L)
            L_pad = jnp.pad(L, ((0, 0), (0, 1)))
            M = jnp.take(L_pad, chk_var, axis=1) - E
        return jnp.stack(outs)

    return posteriors


def train_alphas(
    code,
    snr_db: float,
    iters: int,
    *,
    steps: int = 150,
    batch: int = 128,
    lr: float = 0.05,
    seed: int = 0,
    init_alpha: float = 0.75,
    speed: float | None = None,
    per_degree: bool = False,
    say=print,
):
    """Learn a per-iteration alpha schedule at one operating point.

    Returns ``(alphas numpy, losses [steps])`` with alphas [T], or [T, D]
    degree-specific weights when ``per_degree=True`` (arXiv:2107.04221;
    deployable directly via make_decoder's alpha). ``speed`` follows the
    CLI semantics (Eb/N0 axis scale; defaults to the code rate so snr_db is
    per info bit). Training uses mode-1 BPSK with exact noise.
    """
    import optax

    from ldpc_tpu.ops.channel import ChannelParams, make_channel_fn
    from ldpc_tpu.ops.encode import make_encoder, random_info_bits

    layout = code.layout("orig")
    spec = code.standard_encode_spec
    encode = make_encoder(spec, "orig")
    channel = make_channel_fn(1, 1, n=code.n)
    consts = ChannelParams(
        mode=1, modulation=1, speed=speed if speed is not None else code.rate,
        snr_db=snr_db, noise_model="exact",
    ).consts()
    unrolled = make_unrolled_minsum(layout, iters, per_degree=per_degree)
    k = code.k

    # alpha = 1.5 * sigmoid(raw): positive, bounded, init at init_alpha
    if not 0.0 < init_alpha < 1.5:
        raise ValueError(
            f"init_alpha={init_alpha} outside the schedule's (0, 1.5) "
            "sigmoid parametrization range"
        )
    shape = (
        (iters, len(check_degree_classes(layout)[1])) if per_degree
        else (iters,)
    )
    raw0 = jnp.full(
        shape, float(np.log(init_alpha / (1.5 - init_alpha))), jnp.float32
    )

    def loss_fn(raw, key):
        alphas = 1.5 * jax.nn.sigmoid(raw)
        k_u, k_ch = jax.random.split(key)
        u = random_info_bits(k_u, batch, k)
        w = encode(u)
        llr = channel(k_ch, w, consts)
        Ls = unrolled(alphas, llr)  # [T, B, n], bit=1 <=> L<0
        labels = jnp.broadcast_to(w.astype(jnp.float32), Ls.shape)
        # P(bit=1) = sigmoid(-L): multiloss over every iteration's posterior
        return jnp.mean(optax.sigmoid_binary_cross_entropy(-Ls, labels))

    opt = optax.adam(lr)
    opt_state = opt.init(raw0)

    @jax.jit
    def update(raw, opt_state, key):
        loss, g = jax.value_and_grad(loss_fn)(raw, key)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(raw, updates), opt_state, loss

    raw = raw0
    key = jax.random.key(seed)
    losses = []
    for s in range(steps):
        raw, opt_state, loss = update(raw, opt_state, jax.random.fold_in(key, s))
        losses.append(float(loss))
        if s % max(steps // 5, 1) == 0:
            say(f"  step {s:4d} loss {losses[-1]:.5f}")
    alphas = np.asarray(1.5 * jax.nn.sigmoid(raw))
    say(f"  learned alphas: {np.round(alphas, 4).tolist()}")
    return alphas, losses


def evaluate_alphas(
    code,
    alpha,
    snr_db: float,
    iters: int,
    *,
    blocks: int = 4096,
    batch: int = 512,
    seed: int = 1,
    speed: float | None = None,
):
    """FER/BER of the normalized min-sum decoder with ``alpha`` (scalar or
    per-iteration vector) at one SNR point. Same stream for every alpha at a
    given seed, so comparisons are paired."""
    from ldpc_tpu.ops.channel import ChannelParams, make_channel_fn
    from ldpc_tpu.ops.encode import make_encoder, random_info_bits
    from ldpc_tpu.ops.metrics import block_stats
    from ldpc_tpu.ops.spa import make_decoder

    layout = code.layout("orig")
    spec = code.standard_encode_spec
    info_pos = spec.info_pos("orig")
    encode = make_encoder(spec, "orig")
    channel = make_channel_fn(1, 1, n=code.n)
    consts = ChannelParams(
        mode=1, modulation=1, speed=speed if speed is not None else code.rate,
        snr_db=snr_db, noise_model="exact",
    ).consts()
    decode = make_decoder(
        layout, info_pos, iters, "normalized_minsum", alpha=alpha,
        rule="exact",
    )

    @jax.jit
    def step(key):
        k_u, k_ch = jax.random.split(key)
        u = random_info_bits(k_u, batch, code.k)
        w = encode(u)
        llr = channel(k_ch, w, consts)
        res = decode(llr)
        s = block_stats(u, res, jnp.asarray(info_pos), exact=True)
        return jnp.sum(~s.ok), jnp.sum(s.error_bits)

    key = jax.random.key(seed)
    fails = errs = 0
    n_batches = max(blocks // batch, 1)
    for i in range(n_batches):
        f, e = step(jax.random.fold_in(key, i))
        fails += int(f)
        errs += int(e)
    frames = n_batches * batch
    return {
        "fer": fails / frames,
        "ber": errs / (frames * code.k),
        "frames": frames,
    }
