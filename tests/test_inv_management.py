"""InvManagement env: unit + golden-parity tests (reference
inventory_management.py:224-352; goldens from BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from or_gym_inventory_tpu.core import parity
from or_gym_inventory_tpu.envs import inv_management as im

GOLDEN_DEMANDS_5 = [24, 14, 18, 22, 19]
GOLDEN_BACKLOG_TOTAL = 4700.7806      # seed 42, action (20,20,20), 30 periods
GOLDEN_LOSTSALES_TOTAL = 4796.0254


def _parity_episode(seed, action, params):
    rng = parity.reference_rng(seed)
    demands = parity.inv_management_demand_stream(
        rng, params.dist, params.dist_param_dict, params.periods, params.user_D)
    state, ts = im.reset(params)
    step = jax.jit(im.step_with_demand, static_argnums=0)
    total = 0.0
    action = jnp.asarray(action, jnp.int32)
    for t in range(params.periods):
        state, ts = step(params, state, action, jnp.asarray(demands[t]))
        total += float(ts.reward)
    return demands, total, state


def test_golden_seed42_backlog():
    params = im.default_params(backlog=True)
    demands, total, _ = _parity_episode(42, [20, 20, 20], params)
    assert list(demands[:5]) == GOLDEN_DEMANDS_5
    assert abs(total - GOLDEN_BACKLOG_TOTAL) < 0.5, total


def test_golden_seed42_lost_sales():
    params = im.default_params(backlog=False)
    _, total, _ = _parity_episode(42, [20, 20, 20], params)
    assert abs(total - GOLDEN_LOSTSALES_TOTAL) < 0.5, total


def test_obs_layout_matches_reference_padding():
    # At t < lt_max the reference packs past actions at the FRONT of the
    # pipeline block, zero-padded at the end (inventory_management.py:377-383)
    params = im.default_params(L=(1, 2, 3))
    state, ts = im.reset(params)
    a1 = jnp.asarray([5, 6, 7], jnp.int32)
    state, ts = im.step_with_demand(params, state, a1, 0)
    obs = np.asarray(ts.obs)
    m1, lt = 3, 3
    np.testing.assert_array_equal(obs[m1:m1 + 3], [5, 6, 7])
    np.testing.assert_array_equal(obs[m1 + 3:], np.zeros(2 * m1))
    a2 = jnp.asarray([8, 9, 10], jnp.int32)
    state, ts = im.step_with_demand(params, state, a2, 0)
    obs = np.asarray(ts.obs)
    np.testing.assert_array_equal(obs[m1:m1 + 6], [5, 6, 7, 8, 9, 10])


def test_backlog_accumulates_and_discount():
    params = im.default_params(dist=5, user_D=tuple([100] * 30), backlog=True)
    state, ts = im.reset(params)
    state, ts = im.step_with_demand(params, state, jnp.zeros(3, jnp.int32), 100)
    # retailer starts at 100, demand 100 -> all sold, no backlog at stage 0
    assert int(ts.info["unfulfilled"][0]) == 0
    state, ts = im.step_with_demand(params, state, jnp.zeros(3, jnp.int32), 100)
    # nothing replenished; stage-0 inventory empty -> 100 backlogged
    assert int(ts.info["unfulfilled"][0]) == 100
    assert int(state.backlog_v[0]) == 100


def test_lost_sales_zeroes_backlog():
    params = im.default_params(dist=5, user_D=tuple([500] * 30), backlog=False)
    state, _ = im.reset(params)
    state, ts = im.step_with_demand(params, state, jnp.zeros(3, jnp.int32), 500)
    assert int(ts.info["unfulfilled"][0]) == 400  # 500 - I0[0]=100
    assert int(state.backlog_v[0]) == 0


@pytest.mark.parametrize("seed,backlog", [(0, True), (3, False), (11, True)])
def test_against_live_reference(reference_modules, seed, backlog):
    ref = reference_modules["inv"]
    cls = (ref.InvManagementBacklogEnv if backlog else ref.InvManagementLostSalesEnv)
    env = cls(env_config={"periods": 20})
    obs, _ = env.reset(seed=seed)
    action = np.array([37, 23, 41], np.int64)
    ref_rewards, ref_obs = [], [obs]
    for _ in range(20):
        obs, r, te, tr, info = env.step(action)
        ref_rewards.append(r)
        ref_obs.append(obs)

    params = im.default_params(env_config={"periods": 20}, backlog=backlog)
    rng = parity.reference_rng(seed)
    demands = parity.inv_management_demand_stream(
        rng, params.dist, params.dist_param_dict, 20)
    state, ts = im.reset(params)
    for t in range(20):
        state, ts = im.step_with_demand(
            params, state, jnp.asarray(action, jnp.int32), jnp.asarray(demands[t]))
        np.testing.assert_array_equal(np.asarray(ts.obs), ref_obs[t + 1],
                                      err_msg=f"obs mismatch at t={t}")
        assert abs(float(ts.reward) - ref_rewards[t]) < 1e-2, t


def test_dist_param_validated_at_construction():
    """Wrong dist_param contents raise clear constructor errors, not a
    KeyError deep inside a jitted sampler (VERDICT round-1 weak #6;
    reference validates at inventory_management.py:144-167 but skips
    dist_param contents)."""
    import pytest
    # dist=2 (binomial) with the poisson default {'mu': 20}: missing n/p
    with pytest.raises(AssertionError, match=r"dist=2 requires .*'n', 'p'"):
        im.default_params(dist=2)
    with pytest.raises(AssertionError, match="Binomial p must be in"):
        im.default_params(dist=2, dist_param={"n": 10, "p": 1.5})
    with pytest.raises(AssertionError, match="low <= high"):
        im.default_params(dist=3, dist_param={"low": 9, "high": 3})
    with pytest.raises(AssertionError, match="Geometric p"):
        im.default_params(dist=4, dist_param={"p": 0.0})
    with pytest.raises(AssertionError, match="unexpected"):
        im.default_params(dist=1, dist_param={"mu": 20, "typo": 1})
    # valid configs still construct
    im.default_params(dist=2, dist_param={"n": 40, "p": 0.4})
    im.default_params(dist=3, dist_param={"low": 5, "high": 15})
    im.default_params(dist=4, dist_param={"p": 0.3})
