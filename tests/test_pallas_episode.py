"""Whole-episode Pallas kernel vs the XLA step chain (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.ops import pallas_net_step as pns


def test_episode_kernel_matches_xla_chain():
    params = net.default_params(num_periods=10, backlog=True)
    T = params.topology
    B, steps = 8, 10
    key = jax.random.PRNGKey(2)
    actions = jax.random.uniform(key, (steps, T.n_reorder, B), minval=0.0,
                                 maxval=150.0)
    demands = jax.random.poisson(jax.random.fold_in(key, 1), 20.0,
                                 (steps, T.n_retail, B)).astype(jnp.float32)

    returns = pns.episode_returns(params, actions, demands, block=8,
                                  interpret=True)

    for b in range(B):
        state, _ = net.reset(params)
        total = 0.0
        for t in range(steps):
            state, ts = net.step_with_demand(
                params, state, actions[t, :, b], demands[t, :, b])
            total += float(ts.reward)
        assert abs(float(returns[b]) - total) < 1e-2, (b, float(returns[b]), total)


def test_episode_kernel_discounting():
    params = net.default_params(num_periods=6, backlog=True, alpha=0.9)
    T = params.topology
    actions = jnp.full((6, T.n_reorder, 8), 20.0)
    demands = jnp.full((6, T.n_retail, 8), 20.0)
    returns = pns.episode_returns(params, actions, demands, block=8,
                                  interpret=True)
    state, _ = net.reset(params)
    total = 0.0
    for t in range(6):
        state, ts = net.step_with_demand(params, state, actions[t, :, 0],
                                         demands[t, :, 0])
        total += float(ts.reward)
    np.testing.assert_allclose(float(returns[0]), total, rtol=1e-4)
