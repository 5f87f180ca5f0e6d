"""Pallas fused NetInvMgmt step vs the XLA reference implementation
(interpret mode on CPU; compiled path exercised on TPU benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.envs import topology as topo
from or_gym_inventory_tpu.ops import pallas_net_step as pns


@pytest.mark.parametrize("backlog,topology_fn", [
    (True, topo.default_topology), (False, topo.default_topology),
    (True, topo.custom_topology),
])
def test_fused_step_matches_xla(backlog, topology_fn):
    T = topology_fn(12)
    params = net.NetInvParams(topology=T, num_periods=12, backlog=backlog)
    B = 8
    key = jax.random.PRNGKey(0)
    X, Y, U, RH = pns.init_transposed(params, B)

    # XLA reference states (batch of B envs)
    states = [net.reset(params)[0] for _ in range(B)]

    for t in range(6):
        akey, dkey = jax.random.split(jax.random.fold_in(key, t))
        action = jax.random.uniform(akey, (T.n_reorder, B), minval=0.0,
                                    maxval=200.0)
        demand = jax.random.poisson(
            dkey, 20.0, (T.n_retail, B)).astype(jnp.float32)
        X, Y, U, RH, rew = pns.batched_step(
            params, X, Y, U, RH, action, demand, jnp.asarray(t, jnp.int32),
            block=8, interpret=True)
        for b in range(B):
            states[b], ts = net.step_with_demand(
                params, states[b], action[:, b], demand[:, b])
            np.testing.assert_allclose(np.asarray(X[:, b]),
                                       np.asarray(states[b].X), atol=1e-3,
                                       err_msg=f"X mismatch t={t} b={b}")
            np.testing.assert_allclose(np.asarray(Y[:, b]),
                                       np.asarray(states[b].Y), atol=1e-3)
            np.testing.assert_allclose(np.asarray(U[:, b]),
                                       np.asarray(states[b].U), atol=1e-3)
            assert abs(float(rew[0, b]) - float(ts.reward)) < 1e-2, (t, b)


def test_rollout_transposed_interpret():
    params = net.default_params(num_periods=5)
    total = pns.rollout_transposed(params, jax.random.PRNGKey(1), batch=8,
                                   num_steps=5, block=8, interpret=True)
    assert np.isfinite(float(total))
