"""Newsvendor env: unit + golden-parity tests.

Goldens captured from the reference at seed 42 (BASELINE.md; reference
newsvendor.py:100-204 run on CPython/NumPy in the survey session).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from or_gym_inventory_tpu.core import parity
from or_gym_inventory_tpu.envs import newsvendor as nv

GOLDEN_RESET_OBS = np.array(
    [77.3956, 33.9673, 4.2930, 6.9737, 18.8355, 0, 0, 0, 0, 0], np.float32)
GOLDEN_DEMANDS_5 = [23, 18, 27, 23, 15]
GOLDEN_TOTAL_REWARD_ORDER100 = -99353.0228


def _parity_episode(seed, order, n_steps, params=None):
    """Run our jitted dynamics with reference-order NumPy draws injected."""
    params = params or nv.default_params()
    rng = parity.reference_rng(seed)
    econ = parity.newsvendor_reset_draws(
        rng, params.p_max, params.h_max, params.k_max, params.mu_max)
    state, ts0 = nv.reset_with_econ(params, jnp.asarray(econ))
    demands = parity.newsvendor_demand_stream(rng, econ[4], n_steps)

    step = jax.jit(nv.step_with_demand, static_argnums=0)
    total, obs0 = 0.0, ts0.obs
    action = jnp.asarray([order], jnp.float32)
    rewards = []
    for t in range(n_steps):
        state, ts = step(params, state, action, jnp.asarray(demands[t]))
        rewards.append(float(ts.reward))
    return np.asarray(obs0), demands, float(np.sum(rewards))


def test_golden_seed42_reset_and_demands():
    obs0, demands, _ = _parity_episode(42, 100.0, 5)
    np.testing.assert_allclose(obs0, GOLDEN_RESET_OBS, atol=1e-3)
    assert list(demands[:5]) == GOLDEN_DEMANDS_5


def test_golden_seed42_total_reward():
    _, _, total = _parity_episode(42, 100.0, 40)
    # f32 accumulation over 40 periods of ~1e3-magnitude rewards
    assert abs(total - GOLDEN_TOTAL_REWARD_ORDER100) < 1.0, total


def test_truncation_at_step_limit():
    params = nv.default_params(step_limit=3)
    key = jax.random.PRNGKey(0)
    state, ts = nv.reset(params, key)
    for t in range(3):
        assert not bool(ts.truncated)
        state, ts = nv.step(params, state, jnp.asarray([10.0]), jax.random.fold_in(key, t))
    assert bool(ts.truncated)


def test_pipeline_shift_and_cap():
    # lead_time=2, order more than max_inventory allows -> capped
    params = nv.default_params(lead_time=2, max_inventory=150.0,
                               max_order_quantity=2000.0)
    state, _ = nv.reset_with_econ(params, jnp.asarray([10., 5., 1., 1., 5.]))
    state, ts = nv.step_with_demand(params, state, jnp.asarray([100.0]), 0)
    # pipeline was empty -> order capped at min(100, 150-0)=100, shifts in at tail
    np.testing.assert_allclose(np.asarray(state.pipeline), [0.0, 100.0])
    state, ts = nv.step_with_demand(params, state, jnp.asarray([100.0]), 0)
    # pipeline sum=100 -> cap at 50
    np.testing.assert_allclose(np.asarray(state.pipeline), [100.0, 50.0])


def test_lead_time_zero_quirk():
    # Reference: on-hand is the pre-max_inventory-cap order (newsvendor.py:136-142)
    params = nv.default_params(lead_time=0, max_inventory=50.0)
    state, _ = nv.reset_with_econ(params, jnp.asarray([10., 5., 1., 1., 5.]))
    # order 100 -> on-hand 100 (pre-cap), but purchase cost on capped qty 50
    state, ts = nv.step_with_demand(params, state, jnp.asarray([100.0]), 80)
    # sales=min(100,80)=80, revenue=800; purchase=50*5=250; excess=20*1; short=0
    np.testing.assert_allclose(float(ts.reward), 800 - 250 - 20, rtol=1e-6)


def test_unsold_inventory_expires():
    params = nv.default_params(lead_time=1)
    state, _ = nv.reset_with_econ(params, jnp.asarray([10., 5., 1., 1., 5.]))
    state, _ = nv.step_with_demand(params, state, jnp.asarray([40.0]), 0)
    # 40 arrives next period; zero demand -> all 40 excess, none carried
    state, ts = nv.step_with_demand(params, state, jnp.asarray([0.0]), 0)
    assert float(ts.info["holding_cost"]) == pytest.approx(40.0)
    state, ts = nv.step_with_demand(params, state, jnp.asarray([0.0]), 10)
    # nothing on hand despite last period's excess
    assert float(ts.info["lost_sales_penalty"]) == pytest.approx(10.0)


@pytest.mark.parametrize("seed", [0, 7, 123])
def test_against_live_reference(reference_modules, seed):
    """Oracle check vs the actual reference env (skipped if not present)."""
    ref = reference_modules["newsvendor"]
    env = ref.NewsvendorEnv()
    obs, _ = env.reset(seed=seed)
    n = env.step_limit
    ref_rewards, ref_demands = [], []
    for _ in range(n):
        o, r, te, tr, info = env.step(np.array([137.0], np.float32))
        ref_rewards.append(r)
        ref_demands.append(info["demand"])

    obs0, demands, total = _parity_episode(seed, 137.0, n)
    np.testing.assert_allclose(obs0, obs, atol=1e-3)
    assert list(demands[:n]) == ref_demands
    assert abs(total - sum(ref_rewards)) < 1.0
