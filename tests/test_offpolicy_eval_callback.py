"""Off-policy EvalCallback-equivalent best-model retention."""

import numpy as np

from or_gym_inventory_tpu.agents import off_policy as op
from or_gym_inventory_tpu.envs import newsvendor as nv

TINY = op.OffPolicyConfig(num_envs=8, buffer_size=512, batch_size=32,
                          start_steps=16, pi_arch=(16,), q_arch=(16,))


def test_offpolicy_best_model_retention(tmp_path):
    agent = op.SACAgent(nv.ENV, nv.default_params, config=TINY,
                        model_dir=str(tmp_path), log_dir=str(tmp_path),
                        seed=5, eval_every_chunks=1, eval_episodes=8)
    agent.train({"step_limit": 8}, total_timesteps=8 * 120)
    assert agent.state is not None
    from or_gym_inventory_tpu.envs import adapters as ad
    env = ad.NewsvendorEnv(step_limit=8)
    obs, _ = env.reset(seed=0)
    a = agent.get_action(obs, env)
    assert env.action_space.contains(a)
