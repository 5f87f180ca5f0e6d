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
