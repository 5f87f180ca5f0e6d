from or_gym_inventory_tpu.vector.vecenv import (  # noqa: F401
    batch_reset, batch_step, auto_reset, rollout, evaluate_episodes,
    evaluate_episodes_seeded, Trajectory)
from or_gym_inventory_tpu.vector.fast_episodes import (  # noqa: F401
    policy_episode_returns, random_episode_returns)
