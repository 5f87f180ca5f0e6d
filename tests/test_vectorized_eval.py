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


def test_vectorized_eval_seed_protocol_matches_host():
    """Device path records Seed = seed_offset + i exactly like the host path
    (reference protocol, benchmark_newsvendor.py:227-228), and episode i is a
    pure function of its recorded seed: the same seed yields the same episode
    regardless of batch size or lane position."""
    params = im.default_params(periods=8)
    agent = H.BaseStockAgent(1.0)
    res = evaluate_agent_vectorized(agent, im.ENV, params, 6, seed=4000)
    df = res["summary"]
    assert list(df["Seed"]) == [4000 + i for i in range(6)]

    # re-run episode with seed 4003 alone: identical reward/metrics to lane 3
    res1 = evaluate_agent_vectorized(agent, im.ENV, params, 1, seed=4003)
    row_batch = df.iloc[3]
    row_solo = res1["summary"].iloc[0]
    assert row_solo["Seed"] == row_batch["Seed"] == 4003
    np.testing.assert_allclose(row_solo["TotalReward"],
                               row_batch["TotalReward"], rtol=1e-6)
    np.testing.assert_allclose(row_solo["TotalStockoutQty"],
                               row_batch["TotalStockoutQty"], rtol=1e-6)

    # and a shifted offset reproduces the overlapping episodes
    res_shift = evaluate_agent_vectorized(agent, im.ENV, params, 6, seed=4002)
    np.testing.assert_allclose(res_shift["summary"]["TotalReward"][:4],
                               df["TotalReward"][2:].to_numpy(), rtol=1e-6)


def test_vectorized_eval_host_row_comparability_injected_demand():
    """With injected deterministic demand (dist=5 user_D), a device-path row
    and a host-path row with the same Seed agree on reward and metrics —
    pinning episode-for-episode comparability of the two evaluators."""
    from or_gym_inventory_tpu.bench.evaluate import evaluate_agent
    from or_gym_inventory_tpu.envs import adapters as ad

    user_d = tuple([17, 23, 20, 25, 14, 22, 19, 21])
    params = im.default_params(periods=8, dist=5, user_D=user_d)
    agent = H.BaseStockAgent(1.0)
    res_v = evaluate_agent_vectorized(agent, im.ENV, params, 3, seed=4000)
    res_h = evaluate_agent(
        agent, ad.InvManagementBacklogEnv, 3, seed_offset=4000,
        env_config={"periods": 8, "dist": 5, "user_D": user_d})
    dv, dh = res_v["summary"], res_h["summary"]
    assert list(dv["Seed"]) == list(dh["Seed"])
    np.testing.assert_allclose(dv["TotalReward"], dh["TotalReward"], rtol=1e-4)
    np.testing.assert_allclose(dv["TotalStockoutQty"], dh["TotalStockoutQty"],
                               rtol=1e-4)


def test_vectorized_eval_custom_topology_matches_host():
    """The custom 7-node topology through the device evaluator (the
    OGT_FAST=1 path of benchmark_net_inv_lost_sales.py): with injected
    deterministic per-link user demand, device rows match host-adapter rows
    with the same Seed on reward and metrics."""
    import dataclasses

    from or_gym_inventory_tpu.bench.evaluate import evaluate_agent
    from or_gym_inventory_tpu.envs import adapters as ad
    from or_gym_inventory_tpu.envs import topology as topo

    T = topo.custom_topology(6)
    user = {(1, 0): (17.0, 23.0, 20.0, 25.0, 14.0, 22.0),
            (2, 0): (11.0, 9.0, 15.0, 13.0, 12.0, 10.0),
            (3, 0): (20.0, 20.0, 20.0, 20.0, 20.0, 20.0)}
    T = dataclasses.replace(T, rt_demand=tuple(
        ("user", user[e]) for e in T.retail_links))
    params = net.default_params(topology=T, num_periods=6, backlog=True)
    agent = H.ConstantOrderAgent(0.05)
    res_v = evaluate_agent_vectorized(agent, net.ENV, params, 3, seed=7000)

    def host_factory(**cfg):
        env = ad.NetInvMgmtCustomLostSalesEnv(**cfg)
        return env

    res_h = evaluate_agent(
        agent, host_factory, 3, seed_offset=7000,
        env_config={"num_periods": 6,
                    "user_D": {e: list(user[e]) for e in T.retail_links}})
    dv, dh = res_v["summary"], res_h["summary"]
    assert list(dv["Seed"]) == list(dh["Seed"])
    np.testing.assert_allclose(dv["TotalReward"], dh["TotalReward"],
                               rtol=1e-4)
    np.testing.assert_allclose(dv["AvgServiceLevel"], dh["AvgServiceLevel"],
                               rtol=1e-4)


def test_vectorized_eval_time_excludes_compilation():
    """The reported Time measures a WARM execution: trace+compile goes to
    compile_seconds, so a cold-cache call reports ~the same Time as a
    warm-cache one (previously the first call's Time folded in minutes of
    remote compilation)."""
    # fresh config => nothing cached for this shape in-process
    params = nv.default_params(step_limit=9, mu_max=150.0)
    agent = H.OrderUpToHeuristicAgent(1.0)
    cold = evaluate_agent_vectorized(agent, nv.ENV, params, 5, seed=0)
    warm = evaluate_agent_vectorized(agent, nv.ENV, params, 5, seed=0)
    assert cold["compile_seconds"] > 0
    t_cold = cold["summary"]["Time"].iloc[0]
    t_warm = warm["summary"]["Time"].iloc[0]
    # identical program, warm both times -> same order of magnitude (CPU
    # timing noise); the un-fixed code reported compile+exec here, which is
    # 2-3 orders larger than exec alone
    assert t_cold < max(10 * t_warm, t_warm + 0.2 / 5)
    # and the cold call's compile phase dominated its (excluded) first run
    assert cold["compile_seconds"] > t_cold


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


def test_policy_episode_returns_dispatch():
    """The learned-policy fast-episodes dispatcher: folded-actor policy on
    the XLA fallback for all three families (the TPU path runs the
    policy-in-kernel evaluator, pinned in tests/test_pallas_policy.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from or_gym_inventory_tpu.agents import ppo
    from or_gym_inventory_tpu.envs import newsvendor as nv
    from or_gym_inventory_tpu.envs import inv_management as im2
    from or_gym_inventory_tpu.envs import net_inv_management as net2
    from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek
    from or_gym_inventory_tpu.vector import policy_episode_returns

    cfg = ppo.PPOConfig(pi_arch=(16, 16))
    for params in (nv.default_params(step_limit=6),
                   im2.default_params(periods=5),
                   net2.default_params(num_periods=4)):
        env = {nv.NewsvendorParams: nv.ENV,
               im2.InvManagementParams: im2.ENV,
               net2.NetInvParams: net2.ENV}[type(params)]
        model = ppo._make_model(env, params, cfg)
        obs_dim = env.observation_space(params).shape[0]
        mp = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, obs_dim), jnp.float32))
        actor = pek.fold_actor_params(cfg, mp, ppo.RunningMeanStd.create(obs_dim))
        r = policy_episode_returns(params, actor, jax.random.PRNGKey(1),
                                   batch=16, episodes_per_lane=2)
        r = np.asarray(r)
        assert r.shape == (32,) and np.isfinite(r).all()

    import pytest
    with pytest.raises(TypeError):
        policy_episode_returns(object(), actor, jax.random.PRNGKey(0), 8)


def test_random_episode_returns_episodes_per_lane():
    """episodes_per_lane widens the returned episode count (E*batch,) for
    every family — a pure performance knob (kernel interleave on TPU, batch
    widening on the XLA fallback exercised here)."""
    import jax
    import numpy as np
    from or_gym_inventory_tpu.envs import newsvendor as nv
    from or_gym_inventory_tpu.envs import inv_management as im
    from or_gym_inventory_tpu.envs import net_inv_management as net
    from or_gym_inventory_tpu.vector import random_episode_returns

    for params in (nv.default_params(step_limit=6),
                   im.default_params(periods=5),
                   net.default_params(num_periods=4)):
        r = random_episode_returns(params, jax.random.PRNGKey(1), batch=32,
                                   episodes_per_lane=2)
        r = np.asarray(r)
        assert r.shape == (64,) and np.isfinite(r).all()

    import pytest
    with pytest.raises(ValueError):
        random_episode_returns(nv.default_params(), jax.random.PRNGKey(0),
                               batch=8, episodes_per_lane=0)
