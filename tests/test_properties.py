"""Property tests: conservation laws and invariants of the functional cores
(the test classes SURVEY.md §4 prescribes beyond golden parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.envs import newsvendor as nv
from or_gym_inventory_tpu.envs import topology as topo


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_newsvendor_pipeline_conservation(seed):
    """Every unit ordered enters the pipeline tail and exits the head after
    exactly lead_time periods; nothing is created or destroyed in between."""
    params = nv.default_params(lead_time=4)
    key = jax.random.PRNGKey(seed)
    state, _ = nv.reset(params, key)
    orders, arrivals = [], []
    for t in range(12):
        arrivals.append(float(state.pipeline[0]))
        a = jnp.asarray([float(50 + 13 * t % 97)])
        state, ts = nv.step(params, state, a, jax.random.fold_in(key, t))
        orders.append(float(state.pipeline[-1]))
    # order placed at t arrives (appears at slot 0) at t+lead_time
    for t in range(12 - 4):
        assert orders[t] == arrivals[t + 4]


@pytest.mark.parametrize("backlog", [True, False])
def test_inv_management_stage0_balance(backlog):
    """Retailer on-hand obeys I[t+1,0] = I[t,0] + arrivals - sales."""
    params = im.default_params(backlog=backlog, periods=20)
    key = jax.random.PRNGKey(3)
    state, _ = im.reset(params)
    action = jnp.asarray([40, 40, 40], jnp.int32)
    prev_inv = int(state.inv[0])
    for t in range(20):
        prev_r_hist = np.asarray(state.r_hist)
        state, ts = im.step(params, state, action, jax.random.fold_in(key, t))
        li = params.L[0]
        arrival = int(prev_r_hist[li - 1, 0]) if t >= li else 0
        sales0 = int(ts.info["sales"][0])
        assert int(state.inv[0]) == prev_inv + arrival - sales0
        prev_inv = int(state.inv[0])


def test_inv_management_lost_sales_retailer_nonnegative():
    params = im.default_params(backlog=False, periods=30)
    key = jax.random.PRNGKey(4)
    state, _ = im.reset(params)
    for t in range(30):
        a = jax.random.randint(jax.random.fold_in(key, 100 + t), (3,), 0, 100)
        state, ts = im.step(params, state, a, jax.random.fold_in(key, t))
        # stage 0 can never go negative (sales capped by on-hand)
        assert int(state.inv[0]) >= 0


def test_net_inv_node_flow_conservation():
    """X[t+1] = X[t] + arrivals - consumed - retail_sales, per main node."""
    params = net.default_params(num_periods=20, backlog=True)
    key = jax.random.PRNGKey(5)
    state, _ = net.reset(params)
    T = params.topology
    for t in range(20):
        X_prev = np.asarray(state.X)
        a = jax.random.uniform(jax.random.fold_in(key, 50 + t), (11,),
                               minval=0.0, maxval=80.0)
        state, ts = net.step(params, state, a, jax.random.fold_in(key, t))
        arrivals = np.asarray(ts.info["arrivals"])
        r_cur = np.asarray(ts.info["fulfilled_orders"])
        sales_rt = np.asarray(ts.info["retail_sales"])
        consumed = np.zeros(T.n_main)
        for i, sup in enumerate(T.ro_sup_main):
            if sup >= 0:
                consumed[sup] += r_cur[i] / T.v[sup]
        retail_out = np.zeros(T.n_main)
        for j, ret in enumerate(T.rt_retailer_main):
            retail_out[ret] += sales_rt[j]
        np.testing.assert_allclose(
            np.asarray(state.X), X_prev + arrivals - consumed - retail_out,
            atol=1e-3)


def test_net_inv_fulfillment_never_exceeds_stock():
    """Non-rawmat suppliers never ship more than on-hand (after contention)."""
    params = net.default_params(num_periods=15, backlog=True)
    key = jax.random.PRNGKey(6)
    state, _ = net.reset(params)
    T = params.topology
    for t in range(15):
        X_prev = np.asarray(state.X)
        a = jax.random.uniform(jax.random.fold_in(key, 70 + t), (11,),
                               minval=0.0, maxval=500.0)
        state, ts = net.step(params, state, a, jax.random.fold_in(key, t))
        r_cur = np.asarray(ts.info["fulfilled_orders"])
        shipped = np.zeros(T.n_main)
        for i, sup in enumerate(T.ro_sup_main):
            if sup >= 0:
                shipped[sup] += r_cur[i] / T.v[sup]
        assert np.all(shipped <= X_prev + 1e-3)


def test_discount_factor_scales_reward():
    """alpha**t discounting: identical dynamics, scaled rewards."""
    d = tuple([25] * 10)
    p1 = im.default_params(periods=10, dist=5, user_D=d, alpha=1.0)
    p2 = im.default_params(periods=10, dist=5, user_D=d, alpha=0.9)
    s1, _ = im.reset(p1)
    s2, _ = im.reset(p2)
    a = jnp.asarray([20, 20, 20], jnp.int32)
    for t in range(10):
        s1, ts1 = im.step_with_demand(p1, s1, a, 25)
        s2, ts2 = im.step_with_demand(p2, s2, a, 25)
        np.testing.assert_allclose(float(ts2.reward),
                                   float(ts1.reward) * 0.9 ** t, rtol=1e-4)


def test_custom_topology_no_contention_three_retailers():
    """Custom graph: three retailers fed by one distributor drain it in
    sorted-edge order when stock is short."""
    T = topo.custom_topology(10)
    params = net.NetInvParams(topology=T, num_periods=10, backlog=True)
    state, _ = net.reset(params)
    # drain distributor (node 4, I0=900): request 400 on each (4,x) link
    a = jnp.asarray([400.0, 400.0, 400.0, 0.0, 0.0])
    state, ts = net.step_with_demand(params, state, a, jnp.zeros(3))
    f = np.asarray(ts.info["fulfilled_orders"])
    np.testing.assert_allclose(f[:3], [400.0, 400.0, 100.0])
