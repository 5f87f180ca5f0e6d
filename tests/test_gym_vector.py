"""Batched Gymnasium-style vector env wrapper."""

import numpy as np

from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.vector.gym_vector import BatchedGymVectorEnv


def test_batched_gym_vector_env():
    params = im.default_params(periods=5)
    venv = BatchedGymVectorEnv(im.ENV, params, num_envs=16, seed=0)
    obs, info = venv.reset()
    assert obs.shape == (16, params.pipeline_length)
    a = np.tile(np.array([10, 10, 10], np.int32), (16, 1))
    for t in range(5):
        obs, rew, term, trunc, info = venv.step(a)
        assert rew.shape == (16,)
    assert trunc.all()  # lockstep horizon
    # autoreset: next obs is the fresh-episode obs
    np.testing.assert_array_equal(obs[:, 0],
                                  np.full(16, params.I0[0]))
