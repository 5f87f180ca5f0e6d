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


# ------------------------------------------------------------------ quantile

def poisson_cdf(k: jax.Array, mu) -> jax.Array:
    """P(X <= k) for X ~ Poisson(mu); k may be fractional (floored)."""
    kf = jnp.floor(jnp.maximum(k, -1.0))
    # gammaincc(k+1, mu) = Q(k+1, mu) = CDF_Poisson(k; mu)
    return jnp.where(kf < 0, 0.0, jax.scipy.special.gammaincc(kf + 1.0, mu))


def poisson_ppf(q, mu, max_k: int = 1 << 22) -> jax.Array:
    """Smallest integer k with CDF(k; mu) >= q (scipy.poisson.ppf semantics).

    Fixed 23-iteration integer bisection — branch-free, vmap-safe, no
    data-dependent loops (TPU requirement). Exact vs scipy for mu <~ 500;
    for larger mu the float32 gammaincc CDF limits accuracy to +-1 count
    (relative CDF error ~1e-4), which is inconsequential for the heuristic
    order-up-to policies that consume it.
    """
    q = jnp.asarray(q, dtype=jnp.float32)
    mu = jnp.asarray(mu, dtype=jnp.float32)

    def body(_, bounds):
        lo, hi = bounds
        mid = jnp.floor((lo + hi) / 2.0)
        ok = poisson_cdf(mid, mu) >= q  # mid is a valid upper bound
        return jnp.where(ok, lo, mid + 1.0), jnp.where(ok, mid, hi)

    lo = jnp.zeros_like(mu)
    hi = jnp.full_like(mu, float(max_k))
    n_iter = max_k.bit_length()
    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    out = hi
    # Edge cases per scipy: q<=0 -> -1 is scipy's 0 boundary (scipy returns 0
    # for q=0 with mu>0? scipy gives -1 for q=0; heuristic agents clip q to
    # [0.001, 0.999] so we simply clamp to >= 0 here), q>=1 -> inf (clamped).
    out = jnp.where(q <= 0.0, 0.0, out)
    out = jnp.where(q >= 1.0, float(max_k), out)
    return out
