"""NetInvMgmt env: golden-parity + live-oracle tests
(reference network_management.py:436-635; goldens from BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from or_gym_inventory_tpu.core import parity
from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.envs import topology as topo

GOLDEN_DEFAULT_BACKLOG = 22.19      # seed 42, action 20x11, 30 periods
GOLDEN_CUSTOM_LS = 38561.60         # seed 42, action 20x5, 40 periods


def _parity_episode(seed, action_value, params):
    T = params.topology
    rng = parity.reference_rng(seed)
    demands = parity.net_inv_demand_stream(
        rng, T.retail_dist_params(), params.num_periods)
    state, ts = net.reset(params)
    step = jax.jit(net.step_with_demand, static_argnums=0)
    action = jnp.full((T.n_reorder,), action_value, jnp.float32)
    total = 0.0
    for t in range(params.num_periods):
        state, ts = step(params, state, action, jnp.asarray(demands[t]))
        total += float(ts.reward)
    return total


def test_golden_default_backlog():
    params = net.default_params(num_periods=30, backlog=True)
    total = _parity_episode(42, 20.0, params)
    assert abs(total - GOLDEN_DEFAULT_BACKLOG) < 0.5, total


def test_golden_custom_lost_sales():
    # Reference bug preserved: NetInvMgmtMasterEnv.__init__ overwrites
    # env_config['backlog'] with the init-arg default (network_management.py:
    # 83-85), so the NetInvMgmtLostSalesEnv subclass (which passes backlog
    # only via env_config, :755-761) actually runs with backlog=True. The
    # BASELINE.md golden was measured through that subclass.
    params = net.default_params(topology=topo.custom_topology(40),
                                num_periods=40, backlog=True)
    total = _parity_episode(42, 20.0, params)
    assert abs(total - GOLDEN_CUSTOM_LS) < 2.0, total


def test_obs_dims():
    p_def = net.default_params(num_periods=30)
    assert p_def.obs_dim == 68 and p_def.topology.n_reorder == 11
    p_cus = net.default_params(topology=topo.custom_topology(30))
    assert p_cus.obs_dim == 12 and p_cus.topology.n_reorder == 5
    assert p_cus.topology.retail_links == ((1, 0), (2, 0), (3, 0))
    assert p_cus.topology.reorder_links == (
        (4, 1), (4, 2), (4, 3), (5, 4), (6, 5))


def test_supplier_contention_is_sequential():
    """Two links sharing one supplier drain it in sorted-edge order."""
    nodes = {0: {}, 1: dict(I0=0, h=0.1), 2: dict(I0=0, h=0.1),
             3: dict(I0=50, h=0.1), 9: {}}
    edges = [
        (1, 0, dict(p=1.0, b=0.1, dist_param=dict(lam=1))),
        (2, 0, dict(p=1.0, b=0.1, dist_param=dict(lam=1))),
        (3, 1, dict(L=1, p=0.5, g=0.0)),
        (3, 2, dict(L=1, p=0.5, g=0.0)),
        (9, 3, dict(L=1, p=0.1, g=0.0)),
    ]
    T = topo.compile_graph(nodes, edges, 5)
    params = net.NetInvParams(topology=T, num_periods=5)
    state, _ = net.reset(params)
    # both links request 40 from node 3 holding 50: first (sorted) gets 40,
    # second gets the remaining 10
    action = jnp.asarray([40.0, 40.0, 0.0], jnp.float32)
    state, ts = net.step_with_demand(params, state, action, jnp.zeros(2))
    fulfilled = np.asarray(ts.info["fulfilled_orders"])
    np.testing.assert_allclose(fulfilled[:2], [40.0, 10.0])


def test_factory_capacity_per_order():
    """Factory cap C applies per order, not per period (reference quirk,
    network_management.py:470-478)."""
    nodes = {0: {}, 1: dict(I0=0, h=0.1), 2: dict(I0=0, h=0.1),
             3: dict(I0=500, C=30, o=0.01, v=1.0, h=0.1), 9: {}}
    edges = [
        (1, 0, dict(p=1.0, b=0.1, dist_param=dict(lam=1))),
        (2, 0, dict(p=1.0, b=0.1, dist_param=dict(lam=1))),
        (3, 1, dict(L=1, p=0.5, g=0.0)),
        (3, 2, dict(L=1, p=0.5, g=0.0)),
        (9, 3, dict(L=0, p=0.1, g=0.0)),
    ]
    T = topo.compile_graph(nodes, edges, 5)
    params = net.NetInvParams(topology=T, num_periods=5)
    state, _ = net.reset(params)
    action = jnp.asarray([100.0, 100.0, 0.0], jnp.float32)
    state, ts = net.step_with_demand(params, state, action, jnp.zeros(2))
    fulfilled = np.asarray(ts.info["fulfilled_orders"])
    # each order individually capped at C=30 though 60 > C total
    np.testing.assert_allclose(fulfilled[:2], [30.0, 30.0])


def test_lost_sales_penalty_never_charged():
    """LS mode zeroes U[t+1] before the penalty reads it (reference quirk)."""
    params = net.default_params(num_periods=5, backlog=False)
    state, _ = net.reset(params)
    # zero orders, huge demand -> stockouts, but U stays 0
    state, ts = net.step_with_demand(
        params, state, jnp.zeros(11), jnp.full(1, 1e4))
    assert float(jnp.sum(state.U)) == 0.0


@pytest.mark.parametrize("backlog,periods", [(True, 15), (False, 15)])
def test_against_live_reference_default(reference_modules, backlog, periods):
    ref = reference_modules["net"]
    # backlog=False must go through the master-env kwarg: the LostSales
    # subclass's env_config['backlog']=False is silently overridden back to
    # True by the master __init__ (network_management.py:83-85).
    env = ref.NetInvMgmtMasterEnv(num_periods=periods, backlog=backlog)
    obs, _ = env.reset(seed=5)
    action = np.full(11, 17.0, np.float32)
    ref_obs, ref_rewards = [obs], []
    for _ in range(periods):
        obs, r, te, tr, info = env.step(action)
        ref_obs.append(obs)
        ref_rewards.append(r)

    params = net.default_params(num_periods=periods, backlog=backlog)
    rng = parity.reference_rng(5)
    demands = parity.net_inv_demand_stream(
        rng, params.topology.retail_dist_params(), periods)
    state, ts = net.reset(params)
    np.testing.assert_allclose(np.asarray(ts.obs), ref_obs[0], atol=1e-3)
    for t in range(periods):
        state, ts = net.step_with_demand(
            params, state, jnp.asarray(action), jnp.asarray(demands[t]))
        np.testing.assert_allclose(np.asarray(ts.obs), ref_obs[t + 1],
                                   atol=1e-2, err_msg=f"obs mismatch t={t}")
        assert abs(float(ts.reward) - ref_rewards[t]) < 1e-2, t


def test_against_live_reference_custom(reference_modules):
    ref = reference_modules["net_custom"]
    env = ref.NetInvMgmtLostSalesEnv(num_periods=30)
    obs, _ = env.reset(seed=9)
    action = np.full(5, 33.0, np.float32)
    ref_obs, ref_rewards = [obs], []
    for _ in range(30):
        obs, r, te, tr, info = env.step(action)
        ref_obs.append(obs)
        ref_rewards.append(r)

    # subclass is de facto backlog=True (see note above)
    params = net.default_params(topology=topo.custom_topology(30),
                                num_periods=30, backlog=True)
    rng = parity.reference_rng(9)
    demands = parity.net_inv_demand_stream(
        rng, params.topology.retail_dist_params(), 30)
    state, ts = net.reset(params)
    for t in range(30):
        state, ts = net.step_with_demand(
            params, state, jnp.asarray(action), jnp.asarray(demands[t]))
        np.testing.assert_allclose(np.asarray(ts.obs), ref_obs[t + 1],
                                   atol=1e-2, err_msg=f"obs mismatch t={t}")
        assert abs(float(ts.reward) - ref_rewards[t]) < 1e-2, t
