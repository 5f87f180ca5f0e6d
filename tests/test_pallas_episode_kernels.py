"""Whole-episode Pallas kernels (Newsvendor / InvManagement): exactness vs
the XLA step_with_demand chain, in interpret mode on the CPU mesh.

The in-kernel-RNG variants need the TPU hardware PRNG (no interpret-mode
lowering for pltpu.prng_seed here) — they are validated distributionally on
hardware (benchmarks/pallas_episode.py) and share all step math with the
exact variants tested below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.envs import newsvendor as nv
from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek


def _nv_reference_returns(params, econ, actions, demands):
    """Chain the XLA step_with_demand over the horizon for each lane."""
    B = econ.shape[1]

    def one(econ_lane, acts, dems):
        state, _ = nv.reset_with_econ(params, econ_lane)

        def body(state, inputs):
            a, d = inputs
            state, ts = nv.step_with_demand(params, state, a[None], d)
            return state, ts.reward

        _, rews = jax.lax.scan(body, state, (acts, dems))
        gam = params.gamma ** jnp.arange(params.step_limit, dtype=jnp.float32)
        return jnp.sum(gam * rews)

    return jax.vmap(one, in_axes=(1, 1, 1))(econ, actions, demands)


def test_nv_episode_kernel_exact():
    params = nv.default_params(step_limit=13, lead_time=5)
    B = 256
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    econ = jax.vmap(lambda k: nv.draw_econ(params, k), out_axes=1)(
        jax.random.split(k1, B))
    actions = jax.random.uniform(k2, (params.step_limit, B), minval=-50.0,
                                 maxval=params.max_order_quantity * 1.1)
    demands = jax.random.poisson(k3, econ[4], (params.step_limit, B)
                                 ).astype(jnp.float32)
    got = pek.episode_returns_nv(params, econ, actions, demands,
                                 block=128, interpret=True)
    want = _nv_reference_returns(params, econ, actions, demands)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-2)


def test_nv_episode_kernel_exact_zero_lead_time():
    params = nv.default_params(step_limit=7, lead_time=0)
    B = 128
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    econ = jax.vmap(lambda k: nv.draw_econ(params, k), out_axes=1)(
        jax.random.split(k1, B))
    actions = jax.random.uniform(k2, (params.step_limit, B), minval=0.0,
                                 maxval=params.max_order_quantity)
    demands = jax.random.poisson(k3, econ[4], (params.step_limit, B)
                                 ).astype(jnp.float32)
    got = pek.episode_returns_nv(params, econ, actions, demands,
                                 block=128, interpret=True)
    want = _nv_reference_returns(params, econ, actions, demands)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-2)


class TestNvDynamicPoissonInversion:
    """The per-lane dynamic-mu Poisson inversion behind the fully-fused
    Newsvendor kernel (pek._nv_poisson_setup/_nv_poisson_invert) — pure jnp
    math shared verbatim with the kernel, so it is CPU-testable without the
    hardware PRNG. Reference semantics: one Poisson(mu) draw per period with
    mu drawn per episode (newsvendor.py:111,146)."""

    def _invert(self, params, mu, u):
        mu_arr = jnp.full(u.shape, mu, jnp.float32)
        mu_safe, kc, p_c, t_total = pek._nv_poisson_setup(params, mu_arr)
        _Wb, K, _ = pek._nv_window(params)
        return np.asarray(pek._nv_poisson_invert(
            mu_safe, kc, p_c, t_total, K, [jnp.asarray(u, jnp.float32)])[0])

    def _f64_quantile(self, mu, u):
        # exact inversion against the f64 CDF (same count convention:
        # d = #{k : F(k) <= u})
        n = int(mu + 12 * np.sqrt(mu + 1) + 30)
        pmf = np.zeros(n)
        pmf[0] = np.exp(-mu)
        for i in range(1, n):
            pmf[i] = pmf[i - 1] * mu / i
        cdf = np.cumsum(pmf)
        return np.searchsorted(cdf, u.astype(np.float64), side="right")

    @pytest.mark.parametrize("mu", [0.05, 0.7, 3.0, 20.0, 87.0, 130.0, 199.9])
    def test_matches_f64_quantile(self, mu):
        """f32 recurrence matches the f64 quantile everywhere except a
        vanishing fraction of boundary-straddling uniforms (|diff| <= 1)."""
        params = nv.default_params()
        rng = np.random.default_rng(int(mu * 10))
        u = (rng.integers(0, 1 << 24, size=200_000) * 2.0 ** -24
             ).astype(np.float32)
        got = self._invert(params, mu, u)
        want = self._f64_quantile(mu, u)
        diff = np.abs(got - want)
        assert diff.max() <= 1
        assert (diff != 0).mean() < 2e-3  # f32 boundary fuzz only

    @pytest.mark.parametrize("mu", [0.5, 50.0, 140.0, 199.5])
    def test_moments(self, mu):
        params = nv.default_params()
        rng = np.random.default_rng(7)
        u = rng.random(500_000).astype(np.float32)
        d = self._invert(params, mu, u)
        se = np.sqrt(mu / len(u))
        assert abs(d.mean() - mu) < 6 * se + 1e-3
        assert abs(d.var() - mu) / mu < 0.02

    def test_window_covers_support_at_mu_max(self):
        """Extreme uniforms at mu = mu_max invert within +-1 of the f64
        quantile; u = 0 (probability 2^-24) clamps to the resolution floor
        (the quantile at u ~ 2^-24) rather than jumping to the f64
        discontinuity at exactly 0."""
        params = nv.default_params()
        mu = float(params.mu_max) - 1e-3
        u = np.asarray([2.0 ** -24, 0.5, 1.0 - 2.0 ** -24], np.float32)
        got = self._invert(params, mu, u)
        want = self._f64_quantile(mu, np.asarray(u))
        assert np.abs(got - want).max() <= 1
        d0 = self._invert(params, mu, np.zeros(1, np.float32))[0]
        assert 0 <= d0 <= want[0] + 1

    def test_zero_mu_guard(self):
        params = nv.default_params()
        u = np.linspace(0, 0.9999, 64, dtype=np.float32)
        d = self._invert(params, 0.0, u)
        np.testing.assert_array_equal(d, 0.0)

    def test_cutoff_tail_mass_below_uniform_resolution(self):
        """The per-lane cutoff kc = floor(mu) + w(mu) leaves right-tail mass
        below ~2^-24 for every mu in (0, mu_max] — the clamp at kc is
        invisible at the uniform's resolution (same bar as the static-table
        kernels, tests/test_pallas_fused.py)."""
        import math
        params = nv.default_params()
        Wb, _K, _ = pek._nv_window(params)
        for mu in np.concatenate([np.linspace(0.01, 5, 40),
                                  np.linspace(5, 200, 80)]):
            pad = 2.0 + 4.0 * min(mu, 1.0)
            w = min(math.ceil(pek._NV_TAIL_Z * math.sqrt(mu) + pad), Wb)
            kc = math.floor(mu) + w
            # f64 survival mass beyond kc
            logp = -mu
            tail, logpk = 0.0, -mu
            for k in range(1, kc + 200):
                logpk += math.log(mu / k)
                if k > kc:
                    tail += math.exp(logpk)
            assert tail <= 2.0 ** -23, (mu, kc, tail)


def _im_reference_returns(params, actions, demands):
    def one(acts, dems):
        state, _ = im.reset(params)

        def body(state, inputs):
            a, d = inputs
            state, ts = im.step_with_demand(params, state, a, d)
            return state, ts.reward

        _, rews = jax.lax.scan(body, state, (acts, dems))
        return jnp.sum(rews)  # step reward already alpha^t-discounted

    return jax.vmap(one, in_axes=(2, 1))(actions, demands)


@pytest.mark.parametrize("backlog", [True, False])
def test_im_episode_kernel_exact(backlog):
    params = im.default_params(periods=17, backlog=backlog)
    B = 256
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    c = jnp.asarray(params.c, jnp.int32)
    actions = jax.random.randint(k1, (params.periods, params.m1, B),
                                 0, c[None, :, None] + 1, dtype=jnp.int32)
    demands = jax.random.poisson(k2, 20.0, (params.periods, B)
                                 ).astype(jnp.int32)
    got = pek.episode_returns_im(params, actions, demands,
                                 block=128, interpret=True)
    want = _im_reference_returns(params, actions, demands)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-2)


def test_im_episode_kernel_zero_lead_time_stage():
    """L containing 0 exercises the same-period-arrival branch."""
    params = im.default_params(periods=9, L=(0, 2, 3), dist_param={"mu": 10})
    B = 128
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    c = jnp.asarray(params.c, jnp.int32)
    actions = jax.random.randint(k1, (params.periods, params.m1, B),
                                 0, c[None, :, None] + 1, dtype=jnp.int32)
    demands = jax.random.poisson(k2, 10.0, (params.periods, B)
                                 ).astype(jnp.int32)
    got = pek.episode_returns_im(params, actions, demands,
                                 block=128, interpret=True)
    want = _im_reference_returns(params, actions, demands)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-2)
