from or_gym_inventory_tpu.vector.vecenv import (  # noqa: F401
    batch_reset, batch_step, auto_reset, rollout, evaluate_episodes, Trajectory)
