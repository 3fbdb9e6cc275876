"""Monte-Carlo protograph density evolution on the AWGN channel.

Estimates the asymptotic (infinite-blocklength, cycle-free) decoding
threshold of a protograph LDPC ensemble: the lowest Eb/N0 at which belief
propagation drives the error probability to zero. The reference simulator
has no analysis tooling at all; here the same base graphs that define the
built-in QC codes (ldpc_tpu.models.standards / ldpc_tpu.models.qc) feed the
estimator directly, so code-design questions ("how far from capacity is
WiMAX rate 1/2?") get answers in seconds on the accelerator.

Method (sampled DE, one LLR population per directed base edge):

  * all-zero codeword, BPSK over AWGN: channel LLRs (log(p0/p1) domain)
    are N(4/N0 * ..) -- concretely m0 ~ N(2/sigma^2, 4/sigma^2).
  * variable update for base edge e=(c,v):
        M_e = m0_v + sum_{e' at v, e' != e} E_{e'}
  * check update: E_e = 2 atanh( prod_{e' at c, e' != e} tanh(M_{e'}/2) )
  * populations are independently permuted between updates (the cycle-free
    assumption); error probability = fraction of negative posteriors.

The protograph formulation handles irregular ensembles and multi-edge
(weight >= 2 circulant) base graphs for free -- every base edge keeps its
own message distribution.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def regular_protograph(dv: int, dc: int) -> list[tuple[int, int]]:
    """Base edges of the (dv, dc)-regular ensemble.

    lcm(dv, dc)/dc check types x lcm/dv variable types, wired round-robin so
    every variable has degree dv and every check degree dc.
    """
    l = math.lcm(dv, dc)
    n_chk, n_var = l // dc, l // dv
    edges = []
    k = 0
    for _ in range(l):
        edges.append((k % n_chk, k % n_var))
        k += 1
    # round-robin wiring can duplicate (c,v) pairs; that's fine -- each base
    # edge is its own message population (multi-edge protograph)
    return edges


def _edges_of(graph) -> list[tuple[int, int]]:
    """Accept a QCLayout, an edge list, or an AlistMatrix-like base."""
    if hasattr(graph, "edges"):  # QCLayout: (bi, bj, shift)
        return [(bi, bj) for bi, bj, _ in graph.edges]
    return [(int(c), int(v)) for c, v in graph]


@partial(jax.jit, static_argnums=(0, 2, 3))
def _de_run(edges_key, sigma2, iterations, n_samples, key):
    """edges_key: hashable tuple of (c, v) base edges."""
    edges = edges_key
    n_edges = len(edges)
    chk = np.array([c for c, _ in edges])
    var = np.array([v for _, v in edges])
    n_var = int(var.max()) + 1

    # leave-one-out neighbor lists as static index tables
    def exclusive(ids_of):
        rows = []
        for e in range(n_edges):
            rows.append([e2 for e2 in ids_of[e] if e2 != e])
        width = max((len(r) for r in rows), default=0)
        pad = n_edges  # sentinel row
        # dtype forced: width-0 rows would otherwise default to float64
        return (
            np.array([r + [pad] * (width - len(r)) for r in rows],
                     dtype=np.int32).reshape(n_edges, width),
            width,
        )

    at_chk = [[e2 for e2 in range(n_edges) if chk[e2] == chk[e]] for e in range(n_edges)]
    at_var = [[e2 for e2 in range(n_edges) if var[e2] == var[e]] for e in range(n_edges)]
    excl_chk, wc = exclusive(at_chk)
    excl_var, wv = exclusive(at_var)
    excl_chk = jnp.asarray(excl_chk)
    excl_var = jnp.asarray(excl_var)
    var_j = jnp.asarray(var)

    mean = 2.0 / sigma2
    std = jnp.sqrt(4.0 / sigma2)

    k0, key = jax.random.split(key)
    m0 = mean + std * jax.random.normal(k0, (n_var, n_samples))

    def shuffle_rows(k, x):
        # independent bootstrap resample per population (cycle-free
        # assumption); sampling WITH replacement is an O(N) gather where a
        # permutation would be a sort, and is statistically equivalent for
        # density evolution
        idx = jax.random.randint(k, x.shape, 0, n_samples)
        return jnp.take_along_axis(x, idx, axis=1)

    def body(i, carry):
        M, key = carry
        k1, k2, key = jax.random.split(key, 3)
        Mp = shuffle_rows(k1, M)
        t = jnp.tanh(jnp.clip(Mp / 2.0, -18.0, 18.0))
        # sentinel row appended in the tanh domain: the multiplicative
        # identity 1, so padded slots of lower-degree checks are neutral
        t = jnp.concatenate([t, jnp.ones((1, n_samples))], axis=0)
        prod = jnp.prod(t[excl_chk], axis=1)  # [n_edges, Ns]
        prod = jnp.clip(prod, -0.999999, 0.999999)
        E = 2.0 * jnp.arctanh(prod)
        Ep = shuffle_rows(k2, E)
        Ep = jnp.concatenate([Ep, jnp.zeros((1, n_samples))], axis=0)
        M = m0[var_j] + jnp.sum(Ep[excl_var], axis=1)
        return (M, key)

    M0 = m0[var_j]
    M, key = jax.lax.fori_loop(0, iterations, body, (M0, key))

    # posterior per variable type: m0 + all incoming E (recompute E once)
    t = jnp.tanh(jnp.clip(M / 2.0, -18.0, 18.0))
    t = jnp.concatenate([t, jnp.ones((1, n_samples))], axis=0)
    prod = jnp.clip(jnp.prod(t[excl_chk], axis=1), -0.999999, 0.999999)
    E = 2.0 * jnp.arctanh(prod)
    post = m0.at[var_j].add(E)  # aggregated per variable type
    return jnp.mean(post < 0.0)


def de_error_probability(
    graph,
    ebno_db: float,
    rate: float,
    iterations: int = 200,
    n_samples: int = 20000,
    seed: int = 0,
) -> float:
    """Residual error probability of BP on the ensemble at the given Eb/N0."""
    edges = tuple(_edges_of(graph))
    sigma2 = 1.0 / (2.0 * rate * 10.0 ** (ebno_db / 10.0))
    return float(
        _de_run(edges, jnp.float32(sigma2), iterations, n_samples,
                jax.random.key(seed))
    )


def bec_erasure_fixed_point(graph, epsilon: float, iterations: int = 2000,
                            tol: float = 1e-9) -> float:
    """Exact protograph density evolution on the binary erasure channel.

    Per-edge erasure probabilities evolve deterministically:
        check:    y_e = 1 - prod_{e' at c, e' != e} (1 - x_{e'})
        variable: x_e = eps * prod_{e' at v, e' != e} y_{e'}
    Returns the residual average variable erasure probability (0 when BP
    succeeds). No sampling -- exact to float precision.
    """
    edges = _edges_of(graph)
    n_e = len(edges)
    chk = np.array([c for c, _ in edges])
    var = np.array([v for _, v in edges])
    n_var = int(var.max()) + 1

    def excl(group):
        rows = [[e2 for e2 in range(n_e) if group[e2] == group[e] and e2 != e]
                for e in range(n_e)]
        width = max((len(r) for r in rows), default=0)
        return np.array(
            [r + [n_e] * (width - len(r)) for r in rows], dtype=np.int64
        ).reshape(n_e, width)

    ec, ev = excl(chk), excl(var)
    x = np.full(n_e + 1, epsilon)
    x[n_e] = 0.0  # sentinel: a non-edge never erases (check identity)
    for _ in range(iterations):
        y = 1.0 - np.prod(1.0 - x[ec], axis=1)
        yp = np.concatenate([y, [1.0]])  # sentinel: variable identity
        x_new = np.concatenate([epsilon * np.prod(yp[ev], axis=1), [0.0]])
        if np.abs(x_new - x).max() < tol:
            x = x_new
            break
        x = x_new
    # a-posteriori erasure per variable: eps * prod of ALL incoming y
    y = 1.0 - np.prod(1.0 - x[ec], axis=1)
    post = np.full(n_var, epsilon)
    for e in range(n_e):
        post[var[e]] *= y[e]
    return float(post.mean())


def bec_threshold(graph, lo: float = 0.01, hi: float = 0.99,
                  tol: float = 1e-4, target: float = 1e-9) -> float:
    """BP threshold epsilon* on the BEC by bisection (exact DE).

    Anchor: the (3,6)-regular ensemble has epsilon* = 0.4294.
    """
    if bec_erasure_fixed_point(graph, hi) < target:
        raise ValueError(f"threshold above hi={hi}")
    if bec_erasure_fixed_point(graph, lo) >= target:
        raise ValueError(f"threshold below lo={lo}")
    while hi - lo > tol:
        mid = 0.5 * (lo + hi)
        if bec_erasure_fixed_point(graph, mid) < target:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def protograph_threshold(
    graph,
    rate: float,
    lo_db: float = 0.0,
    hi_db: float = 4.0,
    tol_db: float = 0.05,
    iterations: int = 200,
    n_samples: int = 20000,
    target: float = 1e-3,
    seed: int = 0,
) -> float:
    """BP threshold in Eb/N0 (dB) by bisection on de_error_probability.

    Raises if the threshold lies outside [lo_db, hi_db] (the bracket
    endpoints are evaluated first), rather than silently returning an
    endpoint as the answer.
    """
    kw = dict(rate=rate, iterations=iterations, n_samples=n_samples, seed=seed)
    if de_error_probability(graph, hi_db, **kw) >= target:
        raise ValueError(
            f"BP threshold above hi_db={hi_db} dB (pe >= {target} there); "
            f"raise hi_db"
        )
    if de_error_probability(graph, lo_db, **kw) < target:
        raise ValueError(
            f"BP threshold below lo_db={lo_db} dB (pe < {target} there); "
            f"lower lo_db"
        )
    lo, hi = lo_db, hi_db
    while hi - lo > tol_db:
        mid = 0.5 * (lo + hi)
        pe = de_error_probability(
            graph, mid, rate, iterations=iterations, n_samples=n_samples,
            seed=seed,
        )
        if pe < target:
            hi = mid
        else:
            lo = mid
    return 0.5 * (lo + hi)
