"""Device demand samplers: distributional accuracy vs exact moments/scipy.

Validates SURVEY.md §7 hard part 4 — TPU-safe fixed-iteration samplers must
still be statistically correct, including Poisson at large lambda (the
Newsvendor mu_max=200 regime, newsvendor.py:60)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from or_gym_inventory_tpu.ops import distributions as D

N = 200_000


def _chi2_poisson(samples, lam):
    """Chi-square GOF against the Poisson pmf over a central support window."""
    lo = max(0, int(lam - 5 * np.sqrt(lam)))
    hi = int(lam + 5 * np.sqrt(lam) + 10)
    ks = np.arange(lo, hi)
    probs = stats.poisson.pmf(ks, lam)
    # lump tails
    probs = np.concatenate([[stats.poisson.cdf(lo - 1, lam)], probs,
                            [1 - stats.poisson.cdf(hi - 1, lam)]])
    counts = np.concatenate([[np.sum(samples < lo)],
                             [np.sum(samples == k) for k in ks],
                             [np.sum(samples >= hi)]])
    mask = probs * len(samples) >= 5
    chi2, p = stats.chisquare(counts[mask],
                              probs[mask] / probs[mask].sum() * counts[mask].sum())
    return p


@pytest.mark.parametrize("lam", [0.5, 5.0, 20.0, 200.0])
def test_poisson_sampler_distribution(lam):
    s = np.asarray(D.sample_poisson(jax.random.PRNGKey(int(lam * 7)), lam, (N,)))
    assert abs(s.mean() - lam) < 4 * np.sqrt(lam / N) + 0.02
    assert abs(s.var() - lam) < 0.05 * lam + 0.1
    assert _chi2_poisson(s, lam) > 1e-4


def test_binomial_sampler_moments():
    n, p = 50, 0.3
    s = np.asarray(D.sample_binomial(jax.random.PRNGKey(1), n, p, (N,)))
    assert abs(s.mean() - n * p) < 0.1
    assert abs(s.var() - n * p * (1 - p)) < 0.3
    assert s.min() >= 0 and s.max() <= n


def test_randint_uniformity():
    s = np.asarray(D.sample_randint(jax.random.PRNGKey(2), 10, 20, (N,)))
    assert s.min() == 10 and s.max() == 20  # inclusive bounds
    counts = np.bincount(s - 10, minlength=11)
    _, p = stats.chisquare(counts)
    assert p > 1e-4


def test_geometric_sampler_moments():
    p = 0.25
    s = np.asarray(D.sample_geometric(jax.random.PRNGKey(3), p, (N,)))
    assert s.min() >= 1  # numpy convention: number of trials
    assert abs(s.mean() - 1 / p) < 0.05
    assert abs(s.var() - (1 - p) / p ** 2) < 0.5


def test_negbinomial_sampler_distribution():
    """Gamma-Poisson mixture matches numpy's negative_binomial(n, p)
    (failures before the n-th success): moments + chi-square GOF."""
    n, p = 8, 0.35
    s = np.asarray(D.sample_negbinomial(jax.random.PRNGKey(4), n, p, (N,)))
    mean, var = n * (1 - p) / p, n * (1 - p) / p ** 2
    assert abs(s.mean() - mean) < 4 * np.sqrt(var / N) + 0.05
    assert abs(s.var() - var) / var < 0.05
    hi = int(mean + 6 * np.sqrt(var))
    ks = np.arange(hi)
    probs = stats.nbinom.pmf(ks, n, p)
    probs = np.concatenate([probs, [1 - stats.nbinom.cdf(hi - 1, n, p)]])
    counts = np.concatenate([[np.sum(s == k) for k in ks], [np.sum(s >= hi)]])
    mask = probs * N >= 5
    _, pval = stats.chisquare(counts[mask],
                              probs[mask] / probs[mask].sum() * counts[mask].sum())
    assert pval > 1e-4


def test_normal_rounded_sampler():
    """Rounded-clamped normal: matches the discretized normal pmf
    P(k) = Phi(k+.5) - Phi(k-.5) (with the k=0 bucket absorbing the clamp)."""
    loc, scale = 20.0, 5.0
    s = np.asarray(D.sample_normal_rounded(jax.random.PRNGKey(5), loc, scale, (N,)))
    assert s.min() >= 0
    assert abs(s.mean() - loc) < 0.1
    ks = np.arange(1, 45)
    probs = stats.norm.cdf(ks + 0.5, loc, scale) - stats.norm.cdf(ks - 0.5, loc, scale)
    p0 = stats.norm.cdf(0.5, loc, scale)  # clamp absorbs all mass below 0.5
    probs = np.concatenate([[p0], probs, [1 - stats.norm.cdf(44.5, loc, scale)]])
    counts = np.concatenate([[np.sum(s == 0)], [np.sum(s == k) for k in ks],
                             [np.sum(s >= 45)]])
    mask = probs * N >= 5
    _, pval = stats.chisquare(counts[mask],
                              probs[mask] / probs[mask].sum() * counts[mask].sum())
    assert pval > 1e-4


def test_user_demand_mode():
    sampler = D.make_demand_sampler(D.USER, {}, user_D=[3, 1, 4, 1, 5])
    for t, want in enumerate([3, 1, 4, 1, 5]):
        assert int(sampler(jax.random.PRNGKey(0), jnp.asarray(t))) == want
    # past the end -> 0 (reference inventory_management.py:182)
    assert int(sampler(jax.random.PRNGKey(0), jnp.asarray(9))) == 0


def test_make_demand_sampler_all_modes_jit():
    for dist, param in [(D.POISSON, {"mu": 20}), (D.BINOMIAL, {"n": 40, "p": .4}),
                        (D.RANDINT, {"low": 5, "high": 15}),
                        (D.GEOMETRIC, {"p": 0.3})]:
        sampler = D.make_demand_sampler(dist, param)
        f = jax.jit(lambda k, t: sampler(k, t))
        v = int(f(jax.random.PRNGKey(0), jnp.asarray(0)))
        assert v >= 0


# ------------------------------------------------------------- poisson_ppf

def test_poisson_ppf_exact_vs_scipy_heuristic_range():
    """Exact (+-0) vs scipy across the heuristic agents' operating range,
    including mu >= 1200 where raw f32 gammaincc bisection missed by +-1
    (VERDICT round-1 weak #3): mu*(L+1)*SF reaches ~1440 for Newsvendor."""
    qs = np.array([0.001, 0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95,
                   0.99, 0.999, 0.833333, 0.6, 0.3711], np.float32)
    for mu in [0.5, 5, 20, 200, 500, 1200, 1440, 2000, 4000]:
        want = stats.poisson.ppf(qs.astype(np.float64), mu)
        got = np.asarray(D.poisson_ppf(qs, np.float32(mu)))
        np.testing.assert_array_equal(got, want, err_msg=f"mu={mu}")


def test_poisson_ppf_random_stress():
    rng = np.random.default_rng(7)
    q = rng.uniform(0.001, 0.999, 500).astype(np.float32)
    mu = np.exp(rng.uniform(np.log(0.5), np.log(5000), 500)).astype(np.float32)
    want = stats.poisson.ppf(q.astype(np.float64), mu.astype(np.float64))
    got = np.asarray(D.poisson_ppf(q, mu))
    np.testing.assert_array_equal(got, want)


def test_poisson_ppf_broadcasts_scalar_mu():
    """Regression: vector q with scalar mu used to crash the bisection
    (carry shape mismatch)."""
    qs = jnp.asarray([0.1, 0.5, 0.9], jnp.float32)
    out = np.asarray(D.poisson_ppf(qs, 20.0))
    want = stats.poisson.ppf(np.asarray(qs, np.float64), 20.0)
    np.testing.assert_array_equal(out, want)
    # and scalar q with vector mu
    out2 = np.asarray(D.poisson_ppf(0.9, jnp.asarray([5.0, 50.0, 500.0])))
    want2 = stats.poisson.ppf(0.9, np.array([5.0, 50.0, 500.0]))
    np.testing.assert_array_equal(out2, want2)


def test_poisson_ppf_edge_quantiles():
    assert float(D.poisson_ppf(0.0, 10.0)) == 0.0
    assert float(D.poisson_ppf(1.0, 10.0)) >= 1 << 22 - 1
    assert float(D.poisson_ppf(0.5, 1e-6)) == 0.0
