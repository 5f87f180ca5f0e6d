"""PPOAgent EvalCallback-equivalent: periodic eval keeps the best model."""

import jax
import numpy as np

from or_gym_inventory_tpu.agents import ppo
from or_gym_inventory_tpu.envs import newsvendor as nv


def test_best_model_retention(tmp_path):
    cfg = ppo.PPOConfig(num_envs=16, rollout_steps=8, num_minibatches=2,
                        update_epochs=2, pi_arch=(16,), vf_arch=(16,))
    agent = ppo.PPOAgent(nv.ENV, nv.default_params, name="PPO_cb", config=cfg,
                         model_dir=str(tmp_path), log_dir=str(tmp_path),
                         seed=3, eval_every_updates=2, eval_episodes=8)
    agent.train({"step_limit": 8}, total_timesteps=16 * 8 * 4)
    assert agent.train_state is not None
    # the retained params must reproduce a finite deterministic eval
    policy = ppo.make_eval_policy(nv.ENV, agent.env_params, cfg)
    from or_gym_inventory_tpu.vector import vecenv
    totals, _ = vecenv.evaluate_episodes(
        nv.ENV, agent.env_params, policy,
        (agent.train_state.params, agent.train_state.rms),
        jax.random.PRNGKey(0), 8)
    assert np.isfinite(np.asarray(totals)).all()


def test_eval_callback_fires_with_misaligned_chunking(tmp_path):
    """updates_per_call whose chunk boundaries would miss eval multiples is
    re-aligned (largest chunk dividing eval_every_updates) so the periodic
    best-model eval still fires at the requested cadence."""
    import jax
    import numpy as np
    from or_gym_inventory_tpu.agents import ppo
    from or_gym_inventory_tpu.envs import newsvendor as nv
    from functools import partial

    cfg = ppo.PPOConfig(num_envs=8, rollout_steps=8, num_minibatches=2,
                        update_epochs=1, pi_arch=(16,), vf_arch=(16,),
                        updates_per_call=3)  # re-aligned to 2 (= eval cadence)
    agent = ppo.PPOAgent(nv.ENV, partial(nv.default_params, step_limit=8),
                         name="chunk_eval", config=cfg,
                         model_dir=str(tmp_path), log_dir=str(tmp_path),
                         eval_every_updates=2, eval_episodes=4)
    agent.train({"step_limit": 8}, total_timesteps=8 * 8 * 4)
    # 4 updates, eval at 2 and 4: best-model retention must have engaged
    assert agent.train_state is not None
    # config object itself must be untouched (clamping is call-local)
    assert agent.config.updates_per_call == 3
