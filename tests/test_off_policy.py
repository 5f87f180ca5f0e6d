"""Off-policy learners (SAC/TD3/DDPG): smoke + buffer + save/load tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from or_gym_inventory_tpu.agents import off_policy as op
from or_gym_inventory_tpu.envs import newsvendor as nv

TINY = op.OffPolicyConfig(num_envs=8, buffer_size=512, batch_size=32,
                          start_steps=16, pi_arch=(16,), q_arch=(16,))


def test_replay_buffer_wraps_and_samples():
    buf = op.ReplayBuffer.create(16, 3, 2)
    obs = jnp.arange(30, dtype=jnp.float32).reshape(10, 3)
    act = jnp.zeros((10, 2))
    r = jnp.arange(10, dtype=jnp.float32)
    buf = buf.insert(obs, act, r, obs, jnp.zeros(10, bool))
    assert int(buf.filled) == 10 and int(buf.ptr) == 10
    buf = buf.insert(obs, act, r, obs, jnp.zeros(10, bool))
    assert int(buf.filled) == 16 and int(buf.ptr) == 4  # wrapped
    mb = buf.sample(jax.random.PRNGKey(0), 8)
    assert mb["obs"].shape == (8, 3)


@pytest.mark.parametrize("algo", ["sac", "td3", "ddpg"])
def test_offpolicy_train_smoke(algo):
    params = nv.default_params(step_limit=8)
    cfg = TINY.replace(algo=algo)
    state, eval_policy, metrics = op.train(
        nv.ENV, params, cfg, jax.random.PRNGKey(0),
        total_timesteps=8 * 60, log_every=20)
    assert np.isfinite(metrics["mean_step_reward"]).all()
    obs = jnp.zeros((4, params.obs_dim), jnp.float32)
    a = eval_policy((state.actor_params, state.rms), obs,
                    jax.random.PRNGKey(1), 0)
    assert a.shape == (4, 1)
    assert np.all(np.asarray(a) >= 0) and np.all(np.asarray(a) <= 2000)


def test_offpolicy_agent_save_load(tmp_path):
    agent = op.SACAgent(nv.ENV, nv.default_params, config=TINY,
                        model_dir=str(tmp_path), log_dir=str(tmp_path), seed=2)
    agent.train({"step_limit": 8}, total_timesteps=8 * 40)
    from or_gym_inventory_tpu.envs import adapters as ad
    env = ad.NewsvendorEnv(step_limit=8)
    obs, _ = env.reset(seed=0)
    a1 = agent.get_action(obs, env)

    agent2 = op.SACAgent(nv.ENV, nv.default_params, config=TINY,
                         model_dir=str(tmp_path), log_dir=str(tmp_path), seed=2)
    agent2.env_params = nv.default_params(step_limit=8)
    agent2.load(str(tmp_path / "SAC.msgpack"))
    a2 = agent2.get_action(obs, env)
    np.testing.assert_allclose(a1, a2, rtol=1e-6)
