"""On-device demand distributions and quantile functions.

Covers the reference's five demand modes (inventory_management.py:169-184):
Poisson / Binomial / uniform-integer / Geometric / user-supplied array, plus
the per-edge Poisson samplers of the network env (network_management.py:123),
as counter-based JAX samplers — fixed-iteration algorithms only, so they
vectorize under ``vmap`` and compile to static TPU control flow.

Also provides ``poisson_ppf``: the device-side replacement for
``scipy.stats.poisson.ppf`` used by the heuristic agents
(benchmark_newsvendor.py:153), implemented as integer bisection on the
regularized upper incomplete gamma (CDF(k; mu) = gammaincc(k+1, mu)).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

# Demand mode selectors (match reference `dist` integers, inventory_management.py:163)
POISSON, BINOMIAL, RANDINT, GEOMETRIC, USER = 1, 2, 3, 4, 5


def sample_poisson(key: jax.Array, lam, shape=()) -> jax.Array:
    """Poisson sampler (jax.random.poisson: Knuth for small lam, transformed
    rejection with fixed iteration bounds for large lam — TPU-safe)."""
    return jax.random.poisson(key, lam, shape=shape, dtype=jnp.int32)


def sample_binomial(key: jax.Array, n, p, shape=()) -> jax.Array:
    return jax.random.binomial(key, n, p, shape=shape).astype(jnp.int32)


def sample_randint(key: jax.Array, low, high_inclusive, shape=()) -> jax.Array:
    """Uniform integers on [low, high] inclusive (reference adds +1 to high for
    np_random.integers, inventory_management.py:177)."""
    return jax.random.randint(key, shape, low, high_inclusive + 1, dtype=jnp.int32)


def sample_geometric(key: jax.Array, p, shape=()) -> jax.Array:
    """Geometric on {1, 2, ...} (number of trials), matching numpy's
    Generator.geometric used at inventory_management.py:180."""
    return jax.random.geometric(key, p, shape=shape, dtype=jnp.int32)


def sample_negbinomial(key: jax.Array, n, p, shape=()) -> jax.Array:
    """Negative binomial matching numpy ``Generator.negative_binomial(n, p)``
    (number of failures before the n-th success, success prob p), via the
    exact Gamma(n, (1-p)/p) - Poisson mixture — fixed-iteration, vmap-safe."""
    kg, kp = jax.random.split(key)
    lam = jax.random.gamma(kg, n, shape=shape) * ((1.0 - p) / p)
    return jax.random.poisson(kp, lam, dtype=jnp.int32)


def sample_normal_rounded(key: jax.Array, loc, scale, shape=()) -> jax.Array:
    """Normal(loc, scale) demand rounded half-even and clamped to >= 0 —
    the reference wraps every sampled demand in ``max(0, int(round(.)))``
    (network_management.py:263, 540), which this reproduces."""
    x = loc + scale * jax.random.normal(key, shape)
    return jnp.maximum(0.0, jnp.round(x)).astype(jnp.int32)


def make_demand_sampler(dist: int, dist_param: Dict, user_D=None):
    """Build ``sample(key, t) -> int32 demand`` for one of the 5 modes.

    ``dist``/``dist_param`` are static config; the returned closure is pure
    and jit/vmap-compatible. ``t`` (period index) is only used by USER mode,
    which indexes the injected array (the reference's deterministic-replay
    hook, inventory_management.py:181-182).
    """
    if dist == POISSON:
        lam = float(dist_param["mu"])
        return lambda key, t: sample_poisson(key, lam)
    if dist == BINOMIAL:
        n, p = int(dist_param["n"]), float(dist_param["p"])
        return lambda key, t: sample_binomial(key, n, p)
    if dist == RANDINT:
        low, high = int(dist_param["low"]), int(dist_param["high"])
        return lambda key, t: sample_randint(key, low, high)
    if dist == GEOMETRIC:
        p = float(dist_param["p"])
        return lambda key, t: sample_geometric(key, p)
    if dist == USER:
        arr = jnp.asarray(user_D, dtype=jnp.int32)
        n = arr.shape[0]
        return lambda key, t: jnp.where(t < n, arr[jnp.minimum(t, n - 1)], 0)
    raise ValueError(f"Invalid distribution choice: {dist}")


# ------------------------------------------------- compile-time inversion

_TABLE_CAP = 4096  # unrolled compare-adds per in-kernel inversion


def _accumulate_cdf(pmf_iter, base, granularity):
    """Shared threshold accumulator for every table builder: stop at the
    first F with tail mass below the uniform's resolution (same convention
    as ops/pallas_net_step._poisson_cdf_table); REFUSE loudly if the
    support does not fit the unroll cap — silently truncating a wide
    distribution would make the kernel sample the wrong law (the
    NotImplementedError becomes the dispatchers' loud XLA fallback)."""
    import numpy as np
    F = 0.0
    table = []
    for p in pmf_iter:
        F += p
        table.append(F)
        if 1.0 - F <= granularity:
            break
        if len(table) >= _TABLE_CAP:
            raise NotImplementedError(
                f"demand distribution support exceeds the {_TABLE_CAP}-entry "
                f"inversion-table cap (mass covered: {F:.6f}); pre-sample "
                "this distribution instead")
    return base, tuple(float(np.float32(v)) for v in table)


def discrete_cdf_table(dist: int, dist_param: Dict,
                       granularity: float = 2.0 ** -24):
    """Host-side CDF thresholds for compile-time inversion sampling.

    Returns ``(base, thresholds)`` such that ``demand = base + #{F in
    thresholds : F <= u}`` for u ~ Uniform[0,1) is an EXACT draw from the
    distribution, up to the uniform's resolution (``granularity`` — Pallas
    kernels invert a 24-bit hardware-PRNG uniform). Thresholds are computed
    in float64 and returned as Python floats pre-rounded to f32 (the dtype
    the kernel compares in), to be baked into a kernel as constants — every
    reference ``dist`` mode has static parameters
    (inventory_management.py:169-184), so the table is trace-time data.
    A distribution whose support exceeds the unroll cap raises
    NotImplementedError (loud fallback) rather than silently truncating.

    Supports POISSON / BINOMIAL / RANDINT / GEOMETRIC. USER mode is
    deterministic per period (no sampling) and raises ValueError here.
    """
    import numpy as np

    def _truncate(pmf_iter, base):
        return _accumulate_cdf(pmf_iter, base, granularity)

    if dist == POISSON:
        lam = float(dist_param["mu"])
        if lam <= 0.0:
            return 0, ()

        def pmf():
            p = float(np.exp(-lam))
            k = 0
            while True:
                yield p
                k += 1
                p *= lam / k

        return _truncate(pmf(), 0)
    if dist == BINOMIAL:
        n, p = int(dist_param["n"]), float(dist_param["p"])
        if p <= 0.0:
            return 0, ()
        if p >= 1.0:
            return n, ()

        def pmf():
            q = float(np.exp(n * np.log1p(-p)))  # (1-p)^n, log-safe
            r = p / (1.0 - p)
            for k in range(n + 1):
                yield q
                q *= r * (n - k) / (k + 1.0)

        return _truncate(pmf(), 0)
    if dist == RANDINT:
        low, high = int(dist_param["low"]), int(dist_param["high"])
        span = high - low + 1
        if span - 1 > _TABLE_CAP:
            # keep the loud-fallback contract uniform: a wide span would
            # otherwise silently unroll thousands of per-entry VPU compares
            raise NotImplementedError(
                f"randint span {span} exceeds the {_TABLE_CAP}-entry "
                "inversion-table cap; pre-sample this distribution instead")
        return low, tuple(float(np.float32((k + 1) / span))
                          for k in range(span - 1))
    if dist == GEOMETRIC:
        p = float(dist_param["p"])

        def pmf():
            q = p  # P(X=1); support {1, 2, ...} per numpy Generator.geometric
            while True:
                yield q
                q *= (1.0 - p)

        return _truncate(pmf(), 1)
    raise ValueError(f"No inversion table for dist={dist} "
                     "(USER mode is deterministic per period)")


def cdf_table_for_spec(spec, granularity: float = 2.0 ** -24):
    """``(base, thresholds)`` for a named retail-link demand spec
    (envs/topology.Topology.rt_demand) — the compile-time inversion form of
    every STATIC-parameter distribution the network env supports
    (network_management.py:240-267 resolves per-edge demand callables; the
    topology compiler names them).

    Handles ``poisson``/``binomial``/``geometric`` (via
    ``discrete_cdf_table``), ``randint`` (numpy ``integers`` high-EXCLUSIVE
    semantics, network_management.py quirk mirrored by
    net_inv_management.sample_demand), ``negbinomial`` (failures before the
    n-th success, numpy ``negative_binomial``), and ``normal`` (demand is
    ``max(0, round(X))`` for X ~ N(loc, scale) — itself a discrete
    distribution with static parameters: F(k) = Phi((k + 0.5 - loc)/scale)).
    Returns ``None`` for per-period-DETERMINISTIC specs (``user``/``zero``
    — bake the values instead, no uniform to invert); raises
    NotImplementedError for ``hostfn`` (arbitrary host callable — cannot
    compile to device).
    """
    import math

    tag = spec[0]
    if tag in ("user", "zero"):
        return None
    if tag == "poisson":
        return discrete_cdf_table(POISSON, {"mu": spec[1]}, granularity)
    if tag == "binomial":
        return discrete_cdf_table(BINOMIAL, {"n": spec[1], "p": spec[2]},
                                  granularity)
    if tag == "randint":
        low, high_ex = int(spec[1]), int(spec[2])
        return discrete_cdf_table(RANDINT, {"low": low, "high": high_ex - 1},
                                  granularity)
    if tag == "geometric":
        return discrete_cdf_table(GEOMETRIC, {"p": spec[1]}, granularity)
    if tag == "negbinomial":
        n, p = float(spec[1]), float(spec[2])
        if p >= 1.0:
            return 0, ()

        def pmf():
            # pmf(0) = p^n; pmf(k+1) = pmf(k) * (1-p) * (n+k) / (k+1); n
            # may be non-integer (numpy allows real n via the gamma-Poisson
            # mixture). Run the recurrence in LOG space: p^n itself can
            # underflow float64 (e.g. n=200, p=0.02 -> 1e-340) even though
            # later pmf values are representable.
            log_q = n * math.log(p)
            log_1mp = math.log1p(-p)
            k = 0
            while True:
                yield math.exp(log_q)
                log_q += log_1mp + math.log((n + k) / (k + 1.0))
                k += 1

        return _accumulate_cdf(pmf(), 0, granularity)
    if tag == "normal":
        loc, scale = float(spec[1]), float(spec[2])
        if scale <= 0.0:
            return max(0, int(round(loc))), ()
        inv = 1.0 / (scale * math.sqrt(2.0))
        # start the table 9 sigma below loc (left-tail mass ~1e-19, far
        # under the 24-bit uniform's resolution) so a large loc doesn't
        # walk thousands of all-but-zero entries
        base = max(0, int(math.floor(loc - 9.0 * scale)))

        def pmf():
            prev = 0.0
            k = base
            while True:
                F = 0.5 * (1.0 + math.erf((k + 0.5 - loc) * inv))
                yield F - prev
                prev = F
                k += 1

        return _accumulate_cdf(pmf(), base, granularity)
    raise NotImplementedError(
        f"no compile-time inversion for demand spec {tag!r} (an arbitrary "
        "host callable); pre-sample demand or use a named spec")


# ------------------------------------------------------------------ quantile

def poisson_cdf(k: jax.Array, mu) -> jax.Array:
    """P(X <= k) for X ~ Poisson(mu); k may be fractional (floored)."""
    kf = jnp.floor(jnp.maximum(k, -1.0))
    # gammaincc(k+1, mu) = Q(k+1, mu) = CDF_Poisson(k; mu)
    return jnp.where(kf < 0, 0.0, jax.scipy.special.gammaincc(kf + 1.0, mu))


def _phi(u):
    """phi(u) = u - log1p(u) without cancellation: power series for small u
    (phi = u^2/2 - u^3/3 + ... = u^2 * sum_{j>=0} (-u)^j / (j+2)), direct
    form otherwise. Relative accuracy ~f32 eps on both branches."""
    small = jnp.abs(u) < 0.3
    us = jnp.where(small, u, 0.0)
    # Horner over j = 13..0 of sum (-u)^j/(j+2); |u|<0.3 -> truncation <1e-9
    s = jnp.zeros_like(us)
    for j in range(13, -1, -1):
        s = 1.0 / (j + 2.0) - us * s
    series = us * us * s
    direct = u - jnp.log1p(jnp.where(small, 0.0, u))
    return jnp.where(small, series, direct)


_HALF_LN_2PI = 0.9189385332046727


def _poisson_sf_exceeds(k, mu, q, n_terms: int = 768):
    """Accurate sign of CDF(k; mu) - q for integer k >= 0 (f32 throughout).

    Uses the lower-regularized-gamma series P(a, x) with a = k+1, x = mu:
    CDF(k; mu) = Q(a, x) = 1 - P(a, x), so CDF >= q iff P <= 1-q. The log
    prefactor a*ln(x) - x - lgamma(a+1) is evaluated via a cancellation-free
    Stirling form (f32 lgamma alone has absolute error ~|lgamma|*eps, which
    at a~1200 already exceeds real CDF-vs-q gaps); the series is summed with
    Kahan compensation. Accuracy ~2e-6 absolute in CDF — an order below the
    f32 gammaincc error that produced +-1-count ppf misses at mu ~ 1200.

    Valid while the series converges within ``n_terms`` (needs ~6*sqrt(mu)
    terms): mu <= ~(n_terms/6)^2. Callers gate on that.
    """
    a = k + 1.0
    z = a + 1.0                       # lgamma(a+1) = lgamma(z)
    u = (mu - z) / z
    # t = a*ln(mu) - mu - lgamma(z) via Stirling (z >= 2 here):
    #   = -z*phi(u) - 0.5*log1p(u) - 0.5*ln(mu) - 0.5*ln(2pi) - 1/(12z) + 1/(360z^3)
    t = (-z * _phi(u) - 0.5 * jnp.log1p(u) - 0.5 * jnp.log(jnp.maximum(mu, 1e-30))
         - _HALF_LN_2PI - 1.0 / (12.0 * z) + 1.0 / (360.0 * z ** 3))

    def body(n, carry):
        s, comp, c = carry
        c = c * mu / (a + n)          # term_n = mu^n / prod_{i=1..n}(a+i)
        y = c - comp
        tt = s + y
        comp = (tt - s) - y
        return tt, comp, c

    s0 = jnp.ones_like(a)
    s, _, _ = jax.lax.fori_loop(1, n_terms,body, (s0, jnp.zeros_like(a), s0))
    p_lower = jnp.exp(t) * s          # P(a, mu)
    ok = p_lower <= (1.0 - q)         # CDF(k) >= q
    return jnp.where(k < 0, q <= 0.0, ok)


def poisson_ppf(q, mu, max_k: int = 1 << 22) -> jax.Array:
    """Smallest integer k with CDF(k; mu) >= q (scipy.poisson.ppf semantics).

    Two stages, both branch-free/vmap-safe with fixed iteration counts (TPU
    requirement): (1) 23-iteration integer bisection on the f32 gammaincc
    CDF; (2) a +-2-count local refinement using the high-accuracy series CDF
    (``_poisson_sf_exceeds``) — f32 gammaincc's lgamma-limited error gives
    +-1-count misses from mu ~ 1200 (squarely the heuristic agents' operating
    range: mu*(L+1)*SF up to ~1440), which the refinement corrects. Verified
    exact vs scipy at mu in {20..4000} x a 12-point q grid
    (tests/test_distributions.py). Refinement is gated to mu <= 16000 (series
    budget); beyond that the bisection value is returned unrefined.
    """
    q = jnp.asarray(q, dtype=jnp.float32)
    mu = jnp.asarray(mu, dtype=jnp.float32)
    q, mu = jnp.broadcast_arrays(q, mu)

    def body(_, bounds):
        lo, hi = bounds
        mid = jnp.floor((lo + hi) / 2.0)
        ok = poisson_cdf(mid, mu) >= q  # mid is a valid upper bound
        return jnp.where(ok, lo, mid + 1.0), jnp.where(ok, mid, hi)

    lo = jnp.zeros_like(mu)
    hi = jnp.full_like(mu, float(max_k))
    n_iter = max_k.bit_length()
    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    k0 = hi

    # local refinement: smallest candidate in [k0-2, k0+2] with CDF >= q
    oks = jnp.stack([_poisson_sf_exceeds(k0 + d, mu, q) for d in range(-2, 3)])
    any_ok = jnp.any(oks, axis=0)
    refined = k0 - 2.0 + jnp.argmax(oks, axis=0).astype(k0.dtype)
    refined = jnp.maximum(0.0, jnp.where(any_ok, refined, k0 + 2.0))
    out = jnp.where(mu <= 16000.0, refined, k0)
    # Edge cases per scipy: q<=0 -> -1 is scipy's 0 boundary (scipy returns 0
    # for q=0 with mu>0? scipy gives -1 for q=0; heuristic agents clip q to
    # [0.001, 0.999] so we simply clamp to >= 0 here), q>=1 -> inf (clamped).
    out = jnp.where(q <= 0.0, 0.0, out)
    out = jnp.where(q >= 1.0, float(max_k), out)
    return out
