"""PPO learner: smoke, save/load, and sharded data-parallel tests."""

import jax
import jax.numpy as jnp
import numpy as np

from or_gym_inventory_tpu.agents import ppo
from or_gym_inventory_tpu.envs import newsvendor as nv
from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.parallel import mesh as pmesh
from or_gym_inventory_tpu.vector import vecenv

TINY = ppo.PPOConfig(num_envs=16, rollout_steps=8, num_minibatches=2,
                     update_epochs=2, pi_arch=(16,), vf_arch=(16,))


def test_ppo_train_smoke_newsvendor():
    params = nv.default_params(step_limit=8)
    state, metrics = ppo.train(nv.ENV, params, TINY, jax.random.PRNGKey(0),
                               total_timesteps=16 * 8 * 3)
    assert int(state.update_idx) == 3
    assert len(metrics["mean_step_reward"]) == 3
    assert np.isfinite(metrics["pg_loss"]).all()


def test_ppo_train_smoke_int_actions():
    params = im.default_params(periods=8)
    state, metrics = ppo.train(im.ENV, params, TINY, jax.random.PRNGKey(0),
                               total_timesteps=16 * 8 * 2)
    policy = ppo.make_eval_policy(im.ENV, params, TINY)
    obs = jnp.zeros((4, params.pipeline_length), jnp.int32)
    a = policy((state.params, state.rms), obs, jax.random.PRNGKey(1),
               jnp.zeros((), jnp.int32))
    assert a.shape == (4, 3) and a.dtype == jnp.int32
    space = im.ENV.action_space(params)
    assert np.all(np.asarray(a) >= space.low) and np.all(np.asarray(a) <= space.high)


def test_ppo_noshuffle_minibatches():
    """shuffle_minibatches=False (the TPU-native-batch traffic optimization:
    env-sliced minibatches built once per update) trains to finite metrics,
    runs the same number of gradient steps, and actually learns on the same
    budget as the shuffled recipe."""
    params = nv.default_params(step_limit=8)
    cfg = TINY.replace(shuffle_minibatches=False)
    state, metrics = ppo.train(nv.ENV, params, cfg, jax.random.PRNGKey(0),
                               total_timesteps=16 * 8 * 6)
    assert int(state.update_idx) == 6
    assert np.isfinite(metrics["pg_loss"]).all()
    assert np.isfinite(metrics["mean_step_reward"]).all()
    # env-sliced minibatches need num_envs % num_minibatches == 0; a
    # non-divisible config silently keeps the shuffled path (same API)
    cfg2 = TINY.replace(shuffle_minibatches=False, num_minibatches=3)
    state2, m2 = ppo.train(nv.ENV, params, cfg2, jax.random.PRNGKey(0),
                           total_timesteps=16 * 8 * 2)
    assert np.isfinite(m2["pg_loss"]).all()


def test_shuffle_auto_default_threshold():
    """shuffle_minibatches=None (the default) resolves by batch size: the
    classic shuffled recipe below NOSHUFFLE_ENVS_THRESHOLD, env-sliced at
    TPU-native batch, shuffled again when envs don't divide into
    minibatches; explicit True/False always wins."""
    cfg = ppo.PPOConfig(num_minibatches=8)
    assert cfg.shuffle_minibatches is None
    assert cfg.resolved_shuffle(1024) is True
    assert cfg.resolved_shuffle(ppo.NOSHUFFLE_ENVS_THRESHOLD) is False
    assert cfg.resolved_shuffle(4 * ppo.NOSHUFFLE_ENVS_THRESHOLD) is False
    # non-divisible env count: env slicing impossible -> shuffled
    assert cfg.resolved_shuffle(ppo.NOSHUFFLE_ENVS_THRESHOLD + 4) is True
    assert ppo.PPOConfig(shuffle_minibatches=True).resolved_shuffle(
        1 << 20) is True
    assert ppo.PPOConfig(shuffle_minibatches=False,
                         num_minibatches=8).resolved_shuffle(1024) is False


def test_envsliced_recipe_reward_parity():
    """Beyond the 2-update smoke (VERDICT r4 item 2): 40 updates on the IM
    env with ONLY the minibatch recipe toggled — the env-sliced policy
    reaches the shuffled policy's evaluation reward (same seeded eval
    protocol; deterministic on CPU, generous band vs the eval spread)."""
    params = im.default_params(periods=8)
    base = ppo.PPOConfig(num_envs=64, rollout_steps=8, num_minibatches=4,
                         update_epochs=2, pi_arch=(32,), vf_arch=(32,))

    def run(shuffle):
        cfg = base.replace(shuffle_minibatches=shuffle)
        state, _ = ppo.train(im.ENV, params, cfg, jax.random.PRNGKey(3),
                             total_timesteps=64 * 8 * 40)
        policy = ppo.make_eval_policy(im.ENV, params, cfg)
        totals, _ = vecenv.evaluate_episodes_seeded(
            im.ENV, params, policy, (state.params, state.rms),
            jnp.asarray(100 + np.arange(64)))
        return np.asarray(totals)

    t_sh = run(True)
    t_ns = run(False)
    se = np.sqrt(t_sh.var(ddof=1) / 64 + t_ns.var(ddof=1) / 64)
    assert abs(t_sh.mean() - t_ns.mean()) < max(
        6 * se, 0.15 * abs(t_sh.mean())), (t_sh.mean(), t_ns.mean(), se)


def test_minibatch_chunking_matches_unchunked():
    """minibatch_chunks accumulates the EXACT minibatch gradient in
    sub-chunks (full-minibatch advantage statistics, equal-chunk mean):
    training with chunking on/off from the same seed yields matching
    parameters up to f32 summation order."""
    params = im.default_params(periods=8)
    base = ppo.PPOConfig(num_envs=32, rollout_steps=8, num_minibatches=2,
                         update_epochs=2, pi_arch=(16,), vf_arch=(16,),
                         minibatch_chunks=1)
    chunked = base.replace(minibatch_chunks=4)
    s1, m1 = ppo.train(im.ENV, params, base, jax.random.PRNGKey(0),
                       total_timesteps=32 * 8 * 3)
    s2, m2 = ppo.train(im.ENV, params, chunked, jax.random.PRNGKey(0),
                       total_timesteps=32 * 8 * 3)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(m1["pg_loss"], m2["pg_loss"],
                               rtol=1e-3, atol=1e-4)
    # tiny batches stay unchunked under auto mode (chunk_count -> 1)
    auto = base.replace(minibatch_chunks=0)
    s3, _ = ppo.train(im.ENV, params, auto, jax.random.PRNGKey(0),
                      total_timesteps=32 * 8 * 2)
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(s3.params)[0])).all()


def test_ppo_sharded_matches_api():
    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8
    params = nv.default_params(step_limit=8)
    state, metrics = ppo.train(nv.ENV, params, TINY, jax.random.PRNGKey(0),
                               total_timesteps=16 * 8 * 2, mesh=mesh)
    assert len(metrics["mean_step_reward"]) == 2
    # replicas must hold byte-identical params (divergent init would never
    # be reconciled by pmean'd gradients)
    for leaf in jax.tree_util.tree_leaves(state.params):
        shards = [np.asarray(sh.data) for sh in leaf.addressable_shards]
        for sh in shards[1:]:
            np.testing.assert_array_equal(shards[0], sh)
    # params replicated: evaluating policy on full batch works
    policy = ppo.make_eval_policy(nv.ENV, params, TINY)
    totals, traj = vecenv.evaluate_episodes(
        nv.ENV, params, policy, (state.params, state.rms),
        jax.random.PRNGKey(2), 8)
    assert totals.shape == (8,) and np.isfinite(np.asarray(totals)).all()


def test_ppo_agent_save_load_roundtrip(tmp_path):
    agent = ppo.PPOAgent(nv.ENV, nv.default_params, name="PPO_test",
                         config=TINY, model_dir=str(tmp_path),
                         log_dir=str(tmp_path), seed=1)
    agent.train({"step_limit": 8}, total_timesteps=16 * 8 * 2)
    assert agent.training_time > 0

    from or_gym_inventory_tpu.envs import adapters as ad
    env = ad.NewsvendorEnv(step_limit=8)
    obs, _ = env.reset(seed=0)
    a1 = agent.get_action(obs, env)

    agent2 = ppo.PPOAgent(nv.ENV, nv.default_params, name="PPO_test",
                          config=TINY, model_dir=str(tmp_path),
                          log_dir=str(tmp_path), seed=1)
    agent2.env_params = nv.default_params(step_limit=8)
    agent2.load(str(tmp_path / "PPO_test.msgpack"))
    a2 = agent2.get_action(obs, env)
    np.testing.assert_allclose(a1, a2, rtol=1e-6)

    # checkpoint shortcut: re-train skips (training_time == 0)
    agent3 = ppo.PPOAgent(nv.ENV, nv.default_params, name="PPO_test",
                          config=TINY, model_dir=str(tmp_path),
                          log_dir=str(tmp_path), seed=1)
    agent3.train({"step_limit": 8}, total_timesteps=16 * 8 * 2)
    assert agent3.training_time == 0.0


def test_ppo_chunked_updates_match_count():
    """updates_per_call>1 scans updates on device; metrics still arrive per
    update and the update counter advances identically (incl. a ragged
    final chunk: 5 updates in chunks of 2)."""
    cfg = TINY.replace(updates_per_call=2)
    params = nv.default_params(step_limit=8)
    state, metrics = ppo.train(nv.ENV, params, cfg, jax.random.PRNGKey(0),
                               total_timesteps=16 * 8 * 5)
    assert int(state.update_idx) == 5
    assert list(metrics["update"]) == [1, 2, 3, 4, 5]
    assert np.isfinite(metrics["pg_loss"]).all()
    assert metrics["timesteps"][-1] == 16 * 8 * 5


def test_ppo_chunked_sharded():
    mesh = pmesh.make_mesh()
    cfg = TINY.replace(updates_per_call=2)
    params = nv.default_params(step_limit=8)
    state, metrics = ppo.train(nv.ENV, params, cfg, jax.random.PRNGKey(0),
                               total_timesteps=16 * 8 * 4, mesh=mesh)
    assert len(metrics["update"]) == 4
    assert np.isfinite(metrics["pg_loss"]).all()
    for leaf in jax.tree_util.tree_leaves(state.params):
        shards = [np.asarray(sh.data) for sh in leaf.addressable_shards]
        for sh in shards[1:]:
            np.testing.assert_array_equal(shards[0], sh)


def test_ppo_checkpoint_skip_is_budget_aware(tmp_path):
    """A checkpoint trained for fewer steps than requested must NOT satisfy
    the skip-retrain shortcut (reference SB3AgentWrapper checks
    _total_timesteps, benchmark_InvManagementBacklogEnv.py:243-250). A
    small-budget run previously poisoned later full-budget runs silently."""
    from functools import partial
    mk = lambda: ppo.PPOAgent(nv.ENV, partial(nv.default_params, step_limit=8),
                              name="budget", config=TINY,
                              model_dir=str(tmp_path), log_dir=str(tmp_path))
    small = mk()
    small.train({"step_limit": 8}, total_timesteps=16 * 8 * 1)
    assert small.training_time > 0
    # same budget: skip
    again = mk()
    again.train({"step_limit": 8}, total_timesteps=16 * 8 * 1)
    assert again.training_time == 0.0
    # larger budget: the stale checkpoint must not be used
    bigger = mk()
    bigger.train({"step_limit": 8}, total_timesteps=16 * 8 * 3)
    assert bigger.training_time > 0
    assert int(bigger.train_state.update_idx) == 3
