"""Env + algorithm registries."""

import numpy as np
import pytest

from or_gym_inventory_tpu.agents.algo_registry import make_agent
from or_gym_inventory_tpu.envs import registry


def test_make_host_envs():
    for name in ["Newsvendor-v0", "InvManagementBacklog-v0",
                 "NetInvMgmtCustomLostSales-v0"]:
        env = registry.make(name)
        obs, info = env.reset(seed=0)
        a = env.action_space.sample()
        obs, r, te, tr, info = env.step(a)
        assert np.isfinite(r)


def test_make_functional_envs():
    import jax
    for name in ["Newsvendor-v0", "InvManagementLostSales-v0",
                 "NetInvMgmtBacklog-v0"]:
        env, params = registry.make_functional(name)
        state, ts = env.reset(params, jax.random.PRNGKey(0))
        assert ts.obs.shape == env.observation_space(params).shape


def test_unknown_env_raises():
    with pytest.raises(KeyError):
        registry.make("Nope-v0")


def test_net_lost_sales_functional_matches_adapter_quirk():
    """QUIRKS.md #1: the reference's NetInvMgmt LostSales subclasses de
    facto run backlog=True. The functional registration must agree with
    the adapter, or make_agent-built learners train on dynamics the eval
    env never runs (this bit was backlog=False until round 3)."""
    for name in ["NetInvMgmtLostSales-v0", "NetInvMgmtCustomLostSales-v0",
                 "NetInvMgmtBacklog-v0", "NetInvMgmtCustomBacklog-v0"]:
        _, params = registry.make_functional(name)
        assert params.backlog is True, name


def test_make_agent_by_name(tmp_path):
    agent = make_agent("PPO", "Newsvendor-v0",
                       config_updates={"lr": 1e-4, "num_envs": 8,
                                       "rollout_steps": 4,
                                       "num_minibatches": 2,
                                       "pi_arch": (8,), "vf_arch": (8,)},
                       model_dir=str(tmp_path), log_dir=str(tmp_path))
    assert agent.config.lr == 1e-4
    agent.train({"step_limit": 5}, total_timesteps=64)
    assert agent.train_state is not None


def test_make_agent_unknown_key():
    with pytest.raises(KeyError):
        make_agent("SAC", "Newsvendor-v0", config_updates={"bogus": 1})


def test_make_agent_sb3_style_aliases():
    """SB3/RLlib kwarg spellings map onto the dataclass fields."""
    from or_gym_inventory_tpu.agents.algo_registry import make_agent
    a = make_agent("PPO", "Newsvendor-v0",
                   {"n_steps": 64, "learning_rate": 1e-4})
    assert a.config.rollout_steps == 64 and a.config.lr == 1e-4
    b = make_agent("SAC", "Newsvendor-v0",
                   {"train_batch_size": 128, "learning_starts": 500})
    assert b.config.batch_size == 128 and b.config.start_steps == 500
