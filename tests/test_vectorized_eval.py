"""Vectorized device evaluator across all three families."""

import numpy as np
import pytest

from or_gym_inventory_tpu.agents import heuristics as H
from or_gym_inventory_tpu.agents.base import RandomAgent
from or_gym_inventory_tpu.bench.evaluate import evaluate_agent_vectorized
from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.envs import newsvendor as nv


def test_vectorized_eval_newsvendor_metrics():
    params = nv.default_params(step_limit=10)
    res = evaluate_agent_vectorized(
        H.OrderUpToHeuristicAgent(1.0), nv.ENV, params, 8, seed=0)
    df = res["summary"]
    assert len(df) == 8
    assert (df["Steps"] == 10).all()
    assert ((0 <= df["AvgServiceLevel"]) & (df["AvgServiceLevel"] <= 1)).all()
    assert (df["TotalStockoutQty"] >= 0).all()
    assert res["steps_per_second"] > 0


def test_vectorized_eval_net_metrics():
    params = net.default_params(num_periods=8, backlog=True)
    res = evaluate_agent_vectorized(
        H.ConstantOrderAgent(0.05), net.ENV, params, 4, seed=1)
    df = res["summary"]
    assert len(df) == 4 and np.isfinite(df["TotalReward"]).all()
    assert (df["AvgEndingInv"] > 0).all()


def test_vectorized_eval_requires_device_policy():
    class HostOnly(H.BaseStockAgent):
        def device_policy(self, env, params):
            return None

    params = im.default_params(periods=5)
    with pytest.raises(ValueError):
        evaluate_agent_vectorized(HostOnly(), im.ENV, params, 2)


def test_random_episode_returns_dispatch_and_fallback():
    """fast_episodes dispatches per family and falls back to XLA off-TPU;
    return scale matches a direct XLA rollout."""
    import jax
    import numpy as np
    from or_gym_inventory_tpu.envs import newsvendor as nv
    from or_gym_inventory_tpu.envs import inv_management as im
    from or_gym_inventory_tpu.envs import net_inv_management as net
    from or_gym_inventory_tpu.vector import random_episode_returns

    for params, scale in ((nv.default_params(step_limit=10), 5e6),
                          (im.default_params(periods=8), 1e6),
                          (net.default_params(num_periods=6), 1e6)):
        r = random_episode_returns(params, jax.random.PRNGKey(0), batch=64)
        r = np.asarray(r)
        assert r.shape == (64,) and np.isfinite(r).all()
        assert np.abs(r).max() < scale

    import pytest
    with pytest.raises(TypeError):
        random_episode_returns(object(), jax.random.PRNGKey(0), batch=8)
