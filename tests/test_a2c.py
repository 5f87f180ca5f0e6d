"""A2C config + smoke tests (the SB3-A2C-shaped special case of PPO).

Covers the reference roster's plain A2C entry
(benchmark_InvManagementBacklogEnv.py:698) expressed on the shared PPO
machinery (agents/a2c.py).
"""

import jax
import numpy as np

from or_gym_inventory_tpu.agents import ppo
from or_gym_inventory_tpu.agents.a2c import A2CConfig
from or_gym_inventory_tpu.envs import newsvendor as nv


def test_a2c_config_sb3_shape():
    cfg = A2CConfig()
    assert cfg.optimizer == "rmsprop"       # SB3's A2C default
    assert cfg.update_epochs == 1 and cfg.num_minibatches == 1
    assert cfg.clip_eps == 10.0             # effectively unclipped
    assert not cfg.anneal_lr


def test_a2c_config_optimizer_override():
    # regression: `optimizer=` used to collide with the hardcoded rmsprop
    # kwarg and raise TypeError (duplicate keyword)
    cfg = A2CConfig(optimizer="adam", gae_lambda=0.95, lr=3e-4)
    assert cfg.optimizer == "adam"
    assert cfg.gae_lambda == 0.95


def test_a2c_train_smoke():
    cfg = A2CConfig(num_envs=16, rollout_steps=8, pi_arch=(16,),
                    vf_arch=(16,))
    params = nv.default_params(step_limit=8)
    state, metrics = ppo.train(nv.ENV, params, cfg, jax.random.PRNGKey(0),
                               total_timesteps=16 * 8 * 3)
    assert int(state.update_idx) == 3
    assert np.isfinite(metrics["pg_loss"]).all()
