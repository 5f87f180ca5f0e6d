"""Heuristic policies: device/host consistency, poisson_ppf accuracy, and
oracle checks vs the reference benchmark agents."""

import importlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import poisson

from or_gym_inventory_tpu.agents import heuristics as H
from or_gym_inventory_tpu.envs import adapters as ad
from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.envs import newsvendor as nv
from or_gym_inventory_tpu.ops.distributions import poisson_ppf


def test_poisson_ppf_matches_scipy():
    rng = np.random.default_rng(0)
    q = rng.uniform(0.001, 0.999, 200)
    mu = rng.uniform(0.1, 500.0, 200)
    ours = np.asarray(poisson_ppf(jnp.asarray(q), jnp.asarray(mu)))
    want = poisson.ppf(q, mu)
    np.testing.assert_array_equal(ours, want)


def test_poisson_ppf_large_mu_within_one():
    # float32 gammaincc limits large-mu accuracy to +-1 count (documented)
    rng = np.random.default_rng(1)
    q = rng.uniform(0.001, 0.999, 200)
    mu = rng.uniform(500.0, 2000.0, 200)
    ours = np.asarray(poisson_ppf(jnp.asarray(q), jnp.asarray(mu)))
    want = poisson.ppf(q, mu)
    assert np.max(np.abs(ours - want)) <= 1


@pytest.mark.parametrize("agent", [
    H.OrderUpToHeuristicAgent(1.0), H.OrderUpToHeuristicAgent(0.8),
    H.ClassicNewsvendorAgent("k_vs_h", 1.0),
    H.ClassicNewsvendorAgent("profit_margin", 1.2),
    H.sSPolicyAgent(0.5, 1.2),
])
def test_newsvendor_host_vs_device(agent):
    env = ad.NewsvendorEnv()
    params = nv.default_params()
    policy = agent.device_policy(nv.ENV, params)
    obs, _ = env.reset(seed=3)
    key = jax.random.PRNGKey(0)
    for t in range(10):
        a_host = agent.get_action(obs, env)
        a_dev = np.asarray(policy(None, jnp.asarray(obs)[None], key,
                                  jnp.asarray(t)))[0]
        # +-1 count allowed at large effective mu (poisson_ppf f32 bound)
        np.testing.assert_allclose(a_dev, a_host, atol=1.001)
        obs, *_ = env.step(a_host)


def test_base_stock_host_vs_device():
    env = ad.InvManagementBacklogEnv()
    params = im.default_params()
    agent = H.BaseStockAgent(1.0)
    policy = agent.device_policy(im.ENV, params)
    obs, _ = env.reset(seed=4)
    key = jax.random.PRNGKey(0)
    for t in range(15):
        a_host = agent.get_action(obs, env)
        a_dev = np.asarray(policy(None, jnp.asarray(obs, jnp.int32)[None], key,
                                  jnp.asarray(t)))[0]
        np.testing.assert_array_equal(a_dev, a_host)
        obs, *_ = env.step(a_host)


def test_constant_order_agent():
    env = ad.NetInvMgmtBacklogEnv(num_periods=5)
    agent = H.ConstantOrderAgent(0.1)
    obs, _ = env.reset(seed=0)
    a = agent.get_action(obs, env)
    np.testing.assert_allclose(a, env.action_space.high * 0.1, rtol=1e-6)


@pytest.fixture(scope="module")
def reference_agents():
    import pathlib
    if not pathlib.Path("/root/reference/benchmark_newsvendor.py").exists():
        pytest.skip("reference repo not available")
    sys.path.insert(0, "/root/reference")
    return importlib.import_module("benchmark_newsvendor")


def test_against_reference_newsvendor_agents(reference_agents):
    ref = reference_agents
    env = ad.NewsvendorEnv(step_limit=50)  # ref script's eval config
    pairs = [
        (ref.OrderUpToHeuristicAgent(1.2), H.OrderUpToHeuristicAgent(1.2)),
        (ref.ClassicNewsvendorAgent("k_vs_h", 1.0),
         H.ClassicNewsvendorAgent("k_vs_h", 1.0)),
    ]
    for ref_agent, our_agent in pairs:
        obs, _ = env.reset(seed=11)
        for _ in range(20):
            a_ref = ref_agent.get_action(obs, env)
            a_our = our_agent.get_action(obs, env)
            np.testing.assert_allclose(a_our, a_ref, atol=1e-6)
            obs, *_ = env.step(a_our)
