"""Batched Gymnasium vector env: conformance + external-consumer tests."""

import gymnasium
import numpy as np
import pytest
from gymnasium.vector import AutoresetMode

from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.envs import newsvendor as nv
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
    # SAME_STEP convention: terminal obs rides in info
    assert info["final_obs"].shape == obs.shape


def test_vector_env_conformance():
    """A real gymnasium.vector.VectorEnv: subclass, batched spaces via
    batch_space, declared autoreset mode, spaces contain what reset/step
    produce and accept what action_space samples."""
    from gymnasium.vector.utils import batch_space

    params = im.default_params(periods=4)
    venv = BatchedGymVectorEnv(im.ENV, params, num_envs=8, seed=1)
    assert isinstance(venv, gymnasium.vector.VectorEnv)
    assert venv.metadata["autoreset_mode"] is AutoresetMode.SAME_STEP
    assert venv.observation_space == batch_space(
        venv.single_observation_space, 8)
    assert venv.action_space == batch_space(venv.single_action_space, 8)

    obs, _ = venv.reset(seed=7)
    assert venv.observation_space.contains(
        obs.astype(venv.observation_space.dtype))
    act = venv.action_space.sample()
    assert act.shape[0] == 8
    obs, rew, term, trunc, info = venv.step(act)
    assert venv.observation_space.contains(
        obs.astype(venv.observation_space.dtype))
    assert rew.shape == term.shape == trunc.shape == (8,)
    assert isinstance(info, dict)
    venv.close()
    assert venv.closed


def test_external_consumer_record_episode_statistics():
    """An external gymnasium consumer (RecordEpisodeStatistics, a stock
    vector wrapper that reads num_envs/spaces and accumulates per-episode
    returns from the step stream) drives the env end-to-end."""
    from gymnasium.wrappers.vector import RecordEpisodeStatistics

    params = nv.default_params(step_limit=6)
    venv = BatchedGymVectorEnv(nv.ENV, params, num_envs=4, seed=3)
    wrapped = RecordEpisodeStatistics(venv)
    obs, _ = wrapped.reset(seed=11)
    assert obs.shape == (4, params.obs_dim)
    got_episode_stats = False
    for t in range(6):
        act = wrapped.action_space.sample()
        obs, rew, term, trunc, info = wrapped.step(act)
        if "episode" in info:
            got_episode_stats = True
            # 4 lockstep episodes completed with finite accumulated returns
            assert np.asarray(info["episode"]["r"]).shape == (4,)
            assert np.isfinite(np.asarray(info["episode"]["r"])).all()
    assert got_episode_stats
    wrapped.close()


def test_next_step_autoreset_mode():
    """NEXT_STEP convention (what stateful gymnasium wrappers like
    NormalizeObservation assert): the terminal step returns the terminal
    obs; the following step resets (action ignored, reward 0, done False)."""
    params = im.default_params(periods=3)
    venv = BatchedGymVectorEnv(im.ENV, params, num_envs=8, seed=2,
                               autoreset_mode=AutoresetMode.NEXT_STEP)
    assert venv.metadata["autoreset_mode"] is AutoresetMode.NEXT_STEP
    venv.reset(seed=9)
    a = np.tile(np.array([5, 5, 5], np.int32), (8, 1))
    for t in range(3):
        obs, rew, term, trunc, info = venv.step(a)
    assert trunc.all()          # terminal obs returned, not reset obs
    obs2, rew2, term2, trunc2, _ = venv.step(a)  # deferred reset fires
    assert not trunc2.any() and not term2.any()
    np.testing.assert_array_equal(rew2, np.zeros(8, np.float32))
    np.testing.assert_array_equal(obs2[:, 0], np.full(8, params.I0[0]))

    # an external stateful consumer that *requires* NEXT_STEP drives it
    from gymnasium.wrappers.vector import NormalizeObservation

    venv2 = BatchedGymVectorEnv(im.ENV, params, num_envs=8, seed=3,
                                autoreset_mode="NextStep")
    w = NormalizeObservation(venv2)
    w.reset(seed=1)
    for t in range(7):
        obs, *_ = w.step(a)
    assert np.isfinite(obs).all()
    w.close()


def test_same_step_final_mask_keys():
    """gymnasium SAME_STEP convention: `_final_obs`/`_final_info` boolean
    masks flag which envs actually terminated, so mask-aware consumers
    don't have to assume all-or-none."""
    params = im.default_params(periods=2)
    venv = BatchedGymVectorEnv(im.ENV, params, num_envs=4, seed=0)
    venv.reset()
    a = np.tile(np.array([5, 5, 5], np.int32), (4, 1))
    _, _, term, trunc, info = venv.step(a)
    assert info["_final_obs"].dtype == bool
    np.testing.assert_array_equal(info["_final_obs"], term | trunc)
    np.testing.assert_array_equal(info["_final_info"], term | trunc)
    assert not info["_final_obs"].any()
    _, _, term, trunc, info = venv.step(a)       # horizon reached
    assert info["_final_obs"].all() and info["_final_info"].all()


def test_next_step_nonterminal_cost_matches_plain_step():
    """The NEXT_STEP deferred reset is guarded by lax.cond: non-terminal
    steps must not pay for a full batch_reset (structure pinned via the
    lowered HLO; timing compared against DISABLED-mode plain stepping
    with a generous margin)."""
    import time

    import jax

    params = im.default_params(periods=100000)  # never terminal in-window
    n = 2048
    venv = BatchedGymVectorEnv(im.ENV, params, num_envs=n, seed=0,
                               autoreset_mode=AutoresetMode.NEXT_STEP)
    plain = BatchedGymVectorEnv(im.ENV, params, num_envs=n, seed=0,
                                autoreset_mode=AutoresetMode.DISABLED)
    venv.reset()
    plain.reset()
    a = np.tile(np.array([5, 5, 5], np.int32), (n, 1))

    # structural pin: the reset branch lowers to a conditional region
    txt = venv._step_next.lower(venv._state, venv._pending,
                                a, jax.random.PRNGKey(0)).as_text()
    assert ("stablehlo.if" in txt) or ("stablehlo.case" in txt), \
        "NEXT_STEP reset is no longer conditional"

    def best_of(env_, k=5, iters=8):
        for _ in range(2):           # warm the jit
            env_.step(a)
        times = []
        for _ in range(k):
            t0 = time.perf_counter()
            for _ in range(iters):
                env_.step(a)
            times.append(time.perf_counter() - t0)
        return min(times)

    t_plain = best_of(plain)
    t_next = best_of(venv)
    # old implementation paid step + reset + full-tree select every step
    # (>= 2x); the cond path should be within noise of a plain step
    assert t_next < 1.7 * t_plain, (t_next, t_plain)


def test_disabled_autoreset_mode():
    params = im.default_params(periods=2)
    venv = BatchedGymVectorEnv(im.ENV, params, num_envs=4, seed=0,
                               autoreset_mode=AutoresetMode.DISABLED)
    venv.reset()
    a = np.tile(np.array([5, 5, 5], np.int32), (4, 1))
    _, _, _, trunc, _ = venv.step(a)
    _, _, _, trunc, _ = venv.step(a)
    assert trunc.all()  # stays done until the caller resets
    obs, _ = venv.reset()
    np.testing.assert_array_equal(obs[:, 0], np.full(4, params.I0[0]))


def test_reset_seed_reproducible():
    params = nv.default_params(step_limit=4)
    venv = BatchedGymVectorEnv(nv.ENV, params, num_envs=4, seed=0)
    o1, _ = venv.reset(seed=42)
    o2, _ = venv.reset(seed=42)
    np.testing.assert_array_equal(o1, o2)
