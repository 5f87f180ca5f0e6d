"""Recurrent PPO (LSTM) smoke + host-wrapper tests."""

import jax
import numpy as np

from or_gym_inventory_tpu.agents import recurrent_ppo as rppo
from or_gym_inventory_tpu.envs import newsvendor as nv

TINY = rppo.RecurrentPPOConfig(num_envs=8, rollout_steps=6, num_minibatches=2,
                               update_epochs=2, hidden=8, encoder=(8,))


def test_recurrent_ppo_train_smoke():
    params = nv.default_params(step_limit=6)
    state, eval_episodes, metrics = rppo.train(
        nv.ENV, params, TINY, jax.random.PRNGKey(0),
        total_timesteps=8 * 6 * 3)
    assert len(metrics["mean_step_reward"]) == 3
    assert np.isfinite(metrics["pg_loss"]).all()
    totals = eval_episodes(state.params, state.rms, jax.random.PRNGKey(1), 4)
    assert totals.shape == (4,) and np.isfinite(np.asarray(totals)).all()


def test_recurrent_agent_host_eval(tmp_path):
    agent = rppo.RecurrentPPOAgent(
        nv.ENV, nv.default_params, config=TINY,
        model_dir=str(tmp_path), log_dir=str(tmp_path), seed=0)
    agent.train({"step_limit": 6}, total_timesteps=8 * 6 * 2)

    from or_gym_inventory_tpu.envs import adapters as ad
    env = ad.NewsvendorEnv(step_limit=6)
    obs, _ = env.reset(seed=0)
    actions = []
    for _ in range(6):
        a = agent.get_action(obs, env)
        assert env.action_space.contains(a)
        actions.append(float(a[0]))
        obs, *_ = env.step(a)
    # hidden state evolves -> actions need not be constant
    assert len(actions) == 6
