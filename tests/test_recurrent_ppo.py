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


def test_recurrent_device_eval_path(tmp_path):
    """fast=True coverage for recurrent agents: device_policy_stateful +
    the carry-threading seeded evaluator produce per-episode rows with the
    reference seeding protocol (deterministic in the recorded seeds), so
    PPO_LSTM no longer silently drops to the host episode path."""
    from or_gym_inventory_tpu.bench.evaluate import evaluate_agent_vectorized

    params = nv.default_params(step_limit=6)
    agent = rppo.RecurrentPPOAgent(
        nv.ENV, nv.default_params, config=TINY,
        model_dir=str(tmp_path), log_dir=str(tmp_path), seed=0)
    agent.train({"step_limit": 6}, total_timesteps=8 * 6 * 2)

    sf = agent.device_policy_stateful(nv.ENV, agent.env_params)
    assert sf is not None and agent.device_policy(nv.ENV, params) is None
    res = evaluate_agent_vectorized(agent, nv.ENV, agent.env_params,
                                    n_episodes=5, seed=123)
    df = res["summary"]
    assert len(df) == 5
    assert np.isfinite(df["TotalReward"]).all()
    assert list(df["Seed"]) == list(123 + np.arange(5))
    # seeded protocol: a re-run reproduces the totals exactly
    res2 = evaluate_agent_vectorized(agent, nv.ENV, agent.env_params,
                                     n_episodes=5, seed=123)
    np.testing.assert_array_equal(df["TotalReward"].values,
                                  res2["summary"]["TotalReward"].values)
    # the carry matters: zeroing the hidden state each step (stateless
    # readout of the same model) changes the actions/returns
    carry0_fn, pol = sf

    def stateless_pol(carry, obs, key, t):
        c0 = carry0_fn(obs.shape[0])
        _, a = pol(c0, obs, key, t)
        return carry, a

    from or_gym_inventory_tpu.vector import vecenv as _ve
    tot_carry, _ = _ve.evaluate_episodes_seeded_stateful(
        nv.ENV, agent.env_params, carry0_fn, pol,
        jax.numpy.asarray(123 + np.arange(5)))
    tot_frozen, _ = _ve.evaluate_episodes_seeded_stateful(
        nv.ENV, agent.env_params, carry0_fn, stateless_pol,
        jax.numpy.asarray(123 + np.arange(5)))
    np.testing.assert_array_equal(np.asarray(tot_carry),
                                  df["TotalReward"].values)
    assert np.abs(np.asarray(tot_carry) - np.asarray(tot_frozen)).max() > 0


def test_recurrent_ppo_sharded_trains_on_mesh():
    """Recurrent PPO data-parallel on the virtual 8-device mesh: env batch +
    LSTM carries sharded, params replicated (asserted buffer-for-buffer),
    grads pmean'd (VERDICT round-1 missing #3)."""
    import numpy as np
    from or_gym_inventory_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8
    params = nv.default_params(step_limit=8)
    cfg = rppo.RecurrentPPOConfig(num_envs=16, rollout_steps=8,
                                  num_minibatches=2, update_epochs=1,
                                  hidden=8, encoder=(8,))
    state, eval_episodes, metrics = rppo.train(
        nv.ENV, params, cfg, jax.random.PRNGKey(0),
        total_timesteps=16 * 8 * 2, mesh=mesh)
    assert np.isfinite(metrics["mean_step_reward"]).all()
    # replicas must hold byte-identical params
    for leaf in jax.tree_util.tree_leaves(state.params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)
    totals = eval_episodes(state.params, state.rms, jax.random.PRNGKey(2), 8)
    assert totals.shape == (8,) and np.isfinite(np.asarray(totals)).all()


def test_a2c_lstm_agent_trains(tmp_path):
    """The reference's A2C_LSTM roster entry (A2C with 'MlpLstmPolicy',
    benchmark_InvManagementBacklogEnv.py:713) as a working recurrent A2C."""
    agent = rppo.A2CLSTMAgent(
        nv.ENV, nv.default_params,
        config=rppo.A2CLSTMConfig(num_envs=8, rollout_steps=8,
                                  hidden=8, encoder=(8,)),
        model_dir=str(tmp_path), log_dir=str(tmp_path))
    agent.train({"step_limit": 8}, total_timesteps=8 * 8 * 2)
    from or_gym_inventory_tpu.envs import adapters as ad
    env = ad.NewsvendorEnv(step_limit=8)
    obs, _ = env.reset(seed=0)
    a = agent.get_action(obs, env)
    assert a.shape == (1,) and np.isfinite(a).all()


def test_recurrent_ppo_chunked_updates():
    """updates_per_call>1 scans updates on device (ragged final chunk)."""
    import numpy as np
    cfg = rppo.RecurrentPPOConfig(
        num_envs=8, rollout_steps=8, num_minibatches=2, update_epochs=1,
        hidden=16, encoder=(16,), updates_per_call=2)
    params = nv.default_params(step_limit=8)
    state, _, metrics = rppo.train(nv.ENV, params, cfg, jax.random.PRNGKey(0),
                                   total_timesteps=8 * 8 * 3)
    assert list(metrics["update"]) == [1, 2, 3]
    assert np.isfinite(metrics["pg_loss"]).all()
