"""Trajectory-emitting kernel rollout (PPO experience generation).

The Pallas rollout that replaces the learner's XLA experience-generation
phase (ops/pallas_episode_kernels.rollout_traj_im + PPOConfig(rollout=
"kernel")). CPU tests pin the XLA-side stream consumption (obs assembly,
config validation); the hardware tests pin the kernel by replaying its
dumped action/demand streams through the XLA step_with_demand chain and
run the full kernel-rollout PPO update end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from or_gym_inventory_tpu.agents import ppo
from or_gym_inventory_tpu.envs import inv_management as im


def _replay_chain(params, acts, dems):
    """XLA env chain on given streams: returns (obs_all (T+1, B, D),
    rewards (T, B), final_inv (m1, B)) — the ground truth the rollout
    streams must reproduce."""
    T, m1, B = acts.shape

    @jax.jit
    def run(acts, dems):
        state = jax.vmap(lambda _: im.reset(params)[0])(jnp.arange(B))
        obs0 = jax.vmap(lambda s: im._obs(params, s))(state)

        def body(carry, inp):
            state = carry
            a, d = inp
            state, ts = jax.vmap(im.step_with_demand,
                                 in_axes=(None, 0, 0, 0))(params, state,
                                                          a, d)
            return state, (ts.obs, ts.reward)

        state, (obs_seq, rew) = jax.lax.scan(
            body, state, (acts.transpose(0, 2, 1), dems))
        obs_all = jnp.concatenate([obs0[None], obs_seq], axis=0)
        return obs_all, rew, state.inv.T

    return run(jnp.asarray(acts), jnp.asarray(dems))


def test_assemble_obs_matches_env_chain():
    """assemble_obs_from_streams reproduces the XLA chain's observation
    stream exactly from (start-of-period inv, requested actions)."""
    params = im.default_params(periods=13)
    T, m1, B = params.periods, params.m1, 32
    rng = np.random.default_rng(0)
    acts = rng.integers(0, 80, (T, m1, B)).astype(np.int32)
    dems = rng.poisson(20, (T, B)).astype(np.int32)
    obs_all, _rew, final_inv = _replay_chain(params, acts, dems)

    # start-of-period on-hand: obs rows carry it as the first m1 entries
    inv_stream = np.concatenate(
        [np.asarray(obs_all)[:T, :, :m1].transpose(0, 2, 1),
         np.asarray(final_inv)[None]], axis=0)
    got = np.asarray(im.assemble_obs_from_streams(
        params, jnp.asarray(inv_stream), jnp.asarray(acts)))
    np.testing.assert_array_equal(got, np.asarray(obs_all))


def test_assemble_obs_clamps_negative_requests():
    """The obs history encodes REQUESTED orders max(a, 0); negative raw
    actions must not leak through the assembler."""
    params = im.default_params(periods=6)
    T, m1, B = params.periods, params.m1, 4
    acts = np.full((T, m1, B), -7, np.int32)
    inv = np.zeros((T + 1, m1, B), np.int32)
    got = np.asarray(im.assemble_obs_from_streams(
        params, jnp.asarray(inv), jnp.asarray(acts)))
    assert got.min() == 0


def test_kernel_rollout_config_validation():
    """rollout='kernel' fails loudly off-TPU / off-family / unaligned."""
    from or_gym_inventory_tpu.envs import net_inv_management as net
    from or_gym_inventory_tpu.envs import newsvendor as nv
    params = im.default_params(periods=8)
    cfg = ppo.PPOConfig(rollout="kernel", num_envs=1024, rollout_steps=8)
    with pytest.raises((RuntimeError, NotImplementedError)) as ei:
        ppo.make_update_fn(im.ENV, params, cfg, total_updates=1)
    if jax.default_backend() != "tpu":
        assert "TPU" in str(ei.value)
    with pytest.raises(ValueError, match="rollout_steps"):
        ppo.make_update_fn(im.ENV, params,
                           cfg.replace(rollout_steps=16), total_updates=1)
    # newsvendor/net are supported families: unaligned raises the
    # alignment error, not the family error
    with pytest.raises(ValueError, match="rollout_steps"):
        ppo.make_update_fn(nv.ENV, nv.default_params(step_limit=6),
                           cfg, total_updates=1)
    with pytest.raises(ValueError, match="rollout_steps"):
        ppo.make_update_fn(net.ENV, net.default_params(num_periods=6),
                           cfg, total_updates=1)
    with pytest.raises(ValueError, match="rollout"):
        ppo.make_update_fn(im.ENV, params,
                           cfg.replace(rollout="nope"), total_updates=1)


def test_assemble_nv_obs_matches_env_chain():
    """newsvendor.assemble_obs_from_streams reproduces the XLA chain's
    observation stream exactly from (econ, capped orders) — the pipeline
    row at slot j of period t is the order of period t - L + j."""
    from or_gym_inventory_tpu.envs import newsvendor as nv
    params = nv.default_params(step_limit=11, lead_time=5)
    T, B = params.step_limit, 16
    rng = np.random.default_rng(2)
    econ = np.stack([np.full(B, 50.0), np.full(B, 20.0), np.full(B, 2.0),
                     np.full(B, 5.0), np.full(B, 30.0)]).astype(np.float32)
    acts = rng.uniform(0, 1500, (T, B)).astype(np.float32)
    dems = rng.poisson(30, (T, B)).astype(np.float32)

    @jax.jit
    def run(econ, acts, dems):
        state, ts0 = jax.vmap(nv.reset_with_econ, in_axes=(None, 1))(
            params, econ)

        def body(state, inp):
            a, d = inp
            state, ts = jax.vmap(nv.step_with_demand,
                                 in_axes=(None, 0, 0, 0))(params, state,
                                                          a[:, None], d)
            return state, ts.obs

        state, obs_seq = jax.lax.scan(body, state, (acts, dems))
        return jnp.concatenate([ts0.obs[None], obs_seq], axis=0)

    obs_all = np.asarray(run(jnp.asarray(econ), jnp.asarray(acts),
                             jnp.asarray(dems)))
    # the capped order of period t is the newest pipeline slot of obs t+1
    orders = obs_all[1:, :, 5 + params.lead_time - 1]
    got = np.asarray(nv.assemble_obs_from_streams(
        params, jnp.asarray(econ), jnp.asarray(orders)))
    np.testing.assert_allclose(got, obs_all, rtol=0, atol=0)


def test_apply_actor_critic_matches_flax():
    """The raw-array forward (the kernel path's SGD forward) reproduces
    MLPActorCritic.apply over the same param tree at f32."""
    params = im.default_params(periods=6)
    cfg = ppo.PPOConfig(pi_arch=(32, 16), vf_arch=(24,))
    model = ppo._make_model(im.ENV, params, cfg)
    obs = jax.random.normal(jax.random.PRNGKey(1), (64, 33), jnp.float32)
    mp = model.init(jax.random.PRNGKey(0), obs[:1])
    m1, s1, v1 = model.apply(mp, obs)
    m2, s2, v2 = ppo.apply_actor_critic(mp, obs, cfg)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    # bf16 activations: same function to ~bf16 resolution
    m3, _, v3 = ppo.apply_actor_critic(mp, obs, cfg, dtype="bfloat16")
    assert np.abs(np.asarray(m3) - np.asarray(m1)).max() < 0.05
    assert m3.dtype == jnp.float32  # f32 accumulate/out


def test_compute_dtype_requires_kernel_rollout():
    params = im.default_params(periods=8)
    cfg = ppo.PPOConfig(num_envs=16, rollout_steps=8,
                        compute_dtype="bfloat16")
    with pytest.raises(ValueError, match="compute_dtype"):
        ppo.make_update_fn(im.ENV, params, cfg, total_updates=1)


def _actor_and_logstd(params, cfg, seed=0):
    from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek
    model = ppo._make_model(im.ENV, params, cfg)
    obs_dim = im.ENV.observation_space(params).shape[0]
    mp = model.init(jax.random.PRNGKey(seed),
                    jnp.zeros((1, obs_dim), jnp.float32))
    rms = ppo.RunningMeanStd.create(obs_dim)
    rms = rms.update(50.0 + 20.0 * jax.random.normal(
        jax.random.PRNGKey(seed + 1), (256, obs_dim)))
    return pek.fold_actor_params(cfg, mp, rms), \
        mp["params"]["log_std"], mp, rms


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_traj_kernel_pinned_by_xla_replay():
    """The trajectory kernel's dumped streams are mutually consistent and
    reproduce the env: replaying (actions, demand) through the XLA
    step_with_demand chain yields the dumped inv stream (bit-exact int
    state), the dumped rewards, and the assembled obs; the dumped raw
    actions squash to the dumped int actions."""
    params = im.default_params(periods=12)
    cfg = ppo.PPOConfig(pi_arch=(64, 64))
    actor, log_std, _mp, _rms = _actor_and_logstd(params, cfg)
    from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek
    B = 1024
    tr = pek.rollout_traj_im(params, actor, log_std,
                             jnp.asarray(97, jnp.int32), B)
    acts = np.asarray(tr["actions"])
    dems = np.asarray(tr["demand"])
    obs_all, rew, final_inv = _replay_chain(params, acts, dems)

    # env state: bit-exact int comparison
    inv = np.asarray(tr["inv"])
    np.testing.assert_array_equal(inv[-1], np.asarray(final_inv))
    np.testing.assert_array_equal(
        inv[:-1], np.asarray(obs_all)[:-1, :, :params.m1].transpose(0, 2, 1))
    # rewards: float accumulation, same event math
    np.testing.assert_allclose(np.asarray(tr["reward"]), np.asarray(rew),
                               rtol=1e-5, atol=1e-2)
    # the assembled obs (what the PPO update consumes) == the env chain's
    got = np.asarray(im.assemble_obs_from_streams(
        params, tr["inv"], tr["actions"]))
    np.testing.assert_array_equal(got, np.asarray(obs_all))
    # raw -> squash -> int cast reproduces the env-consumed actions
    # (HIGHEST-precision kernel matmuls; isolated int-cast boundary ties)
    c = np.asarray(params.c, np.float32)
    a_re = ((np.tanh(np.asarray(tr["raw"]).transpose(0, 2, 1)) + 1.0)
            * 0.5 * c).astype(np.int32)
    assert (a_re == acts.transpose(0, 2, 1)).mean() > 0.999
    # exploration noise is live: distinct lanes act differently
    assert acts.std(axis=-1).mean() > 0


def _net_stream_positions(T):
    """(x_off, window_last_offsets): obs positions of X and of each L>0
    link's newest window entry (= r_cur of the previous period)."""
    off = T.n_retail + T.n_main
    last = {}
    for i, L in enumerate(T.ro_L):
        if L == 0:
            continue
        last[i] = off + L - 1
        off += L
    return T.n_retail, last


def test_assemble_net_obs_matches_env_chain():
    """net_inv_management.assemble_obs_from_streams reproduces the XLA
    chain's observation stream exactly from the (X, U, r_cur) streams
    extracted from that same chain."""
    from or_gym_inventory_tpu.envs import net_inv_management as net
    params = net.default_params(num_periods=9)
    T_ = params.topology
    Tn, B = params.num_periods, 8
    rng = np.random.default_rng(5)
    acts = rng.uniform(0, 300, (Tn, B, T_.n_reorder)).astype(np.float32)
    dems = rng.poisson(15, (Tn, T_.n_retail, B)).astype(np.float32)

    @jax.jit
    def run(acts, dems):
        state = jax.vmap(lambda _: net.reset(params)[0])(jnp.arange(B))
        obs0 = jax.vmap(lambda s: net._obs(params, s))(state)

        def body(state, inp):
            a, d = inp
            state, ts = jax.vmap(net.step_with_demand,
                                 in_axes=(None, 0, 0, 1))(params, state, a, d)
            return state, ts.obs

        state, obs_seq = jax.lax.scan(body, state, (acts, dems))
        return jnp.concatenate([obs0[None], obs_seq], axis=0)

    obs_all = np.asarray(run(jnp.asarray(acts), jnp.asarray(dems)))
    n_rt, n_main = T_.n_retail, T_.n_main
    u = obs_all[:, :, :n_rt].transpose(0, 2, 1)
    x = obs_all[:, :, n_rt:n_rt + n_main].transpose(0, 2, 1)
    # r_cur[t, i] = the newest window entry of link i in obs t+1
    _, last = _net_stream_positions(T_)
    r = np.zeros((Tn, T_.n_reorder, B), np.float32)
    for i, pos in last.items():
        r[:, i, :] = obs_all[1:, :, pos]
    # links with L == 0 never appear in any obs window; their r values
    # are irrelevant to the assembly
    got = np.asarray(net.assemble_obs_from_streams(
        params, jnp.asarray(x), jnp.asarray(u), jnp.asarray(r)))
    np.testing.assert_allclose(got, obs_all, rtol=0, atol=0)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_net_traj_kernel_pinned_by_xla_replay():
    """The network-family trajectory kernel: replaying the squashed raws
    + dumped demand through the XLA step_with_demand chain reproduces the
    dumped X/U/r/reward streams (float env — fraction-closeness, as in
    the NV pin)."""
    from or_gym_inventory_tpu.envs import net_inv_management as net
    from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek
    from or_gym_inventory_tpu.ops import pallas_net_step as pns
    params = net.default_params(num_periods=10)
    T_ = params.topology
    cfg = ppo.PPOConfig(pi_arch=(64, 64))
    model = ppo._make_model(net.ENV, params, cfg)
    obs_dim = net.ENV.observation_space(params).shape[0]
    mp = model.init(jax.random.PRNGKey(8),
                    jnp.zeros((1, obs_dim), jnp.float32))
    rms = ppo.RunningMeanStd.create(obs_dim)
    rms = rms.update(100.0 + 40.0 * jax.random.normal(
        jax.random.PRNGKey(9), (256, obs_dim)))
    actor = pek.fold_actor_params(cfg, mp, rms)
    log_std = mp["params"]["log_std"]
    B = 1024
    tr = pns.rollout_traj_net(params, actor, log_std,
                              jnp.asarray(29, jnp.int32), B)
    hi = float(T_.order_cap_heuristic * 2)
    acts = ((np.tanh(np.asarray(tr["raw"])) + 1.0) * (0.5 * hi)
            ).transpose(0, 2, 1)                        # (T, B, n_ro)

    @jax.jit
    def run(acts, dems):
        state = jax.vmap(lambda _: net.reset(params)[0])(jnp.arange(B))
        obs0 = jax.vmap(lambda s: net._obs(params, s))(state)

        def body(state, inp):
            a, d = inp
            state, ts = jax.vmap(net.step_with_demand,
                                 in_axes=(None, 0, 0, 1))(params, state, a, d)
            return state, (ts.obs, ts.reward)

        state, (obs_seq, rew) = jax.lax.scan(body, state, (acts, dems))
        return jnp.concatenate([obs0[None], obs_seq], axis=0), rew

    obs_all, rew = run(jnp.asarray(acts), tr["demand"])
    obs_all = np.asarray(obs_all)
    n_rt, n_main = T_.n_retail, T_.n_main

    def frac_close(a, b):
        return np.isclose(a, b, rtol=1e-3, atol=2.0).mean()

    assert frac_close(np.asarray(tr["reward"]), np.asarray(rew)) > 0.99
    assert frac_close(np.asarray(tr["u"]),
                      obs_all[:, :, :n_rt].transpose(0, 2, 1)) > 0.995
    assert frac_close(np.asarray(tr["x"]),
                      obs_all[:, :, n_rt:n_rt + n_main].transpose(0, 2, 1)
                      ) > 0.995
    got = np.asarray(net.assemble_obs_from_streams(
        params, tr["x"], tr["u"], tr["r"]))
    assert frac_close(got, obs_all) > 0.995
    assert acts.std(axis=1).mean() > 0  # exploration noise live


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_net_kernel_ppo_update_runs():
    from or_gym_inventory_tpu.envs import net_inv_management as net
    params = net.default_params(num_periods=10)
    cfg = ppo.PPOConfig(rollout="kernel", num_envs=1024, rollout_steps=10,
                        num_minibatches=4, update_epochs=2,
                        updates_per_call=1)
    U = 2
    update = ppo.make_update_fn(net.ENV, params, cfg, total_updates=U)
    state = jax.jit(lambda k: ppo.init_train_state(
        net.ENV, params, cfg, k, U))(jax.random.PRNGKey(0))
    chunk = jax.jit(lambda st, ks: jax.lax.scan(update, st, ks))
    new_state, ms = chunk(state, jax.random.split(jax.random.PRNGKey(1), U))
    for k in ("pg_loss", "v_loss", "entropy", "mean_step_reward"):
        assert np.isfinite(np.asarray(ms[k])).all(), k
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    l1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.abs(np.asarray(l1) - np.asarray(l0)).max() > 0


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_nv_traj_kernel_pinned_by_xla_replay():
    """The Newsvendor trajectory kernel: replaying the squashed raw
    actions + dumped demand through the XLA step_with_demand chain (with
    the dumped econ) reproduces the dumped rewards and capped orders, and
    the assembled obs equals the chain's (float env — tolerance-based)."""
    from or_gym_inventory_tpu.envs import newsvendor as nv
    from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek
    params = nv.default_params(step_limit=12)
    cfg = ppo.PPOConfig(pi_arch=(64, 64))
    model = ppo._make_model(nv.ENV, params, cfg)
    obs_dim = nv.ENV.observation_space(params).shape[0]
    mp = model.init(jax.random.PRNGKey(3),
                    jnp.zeros((1, obs_dim), jnp.float32))
    rms = ppo.RunningMeanStd.create(obs_dim)
    rms = rms.update(60.0 + 25.0 * jax.random.normal(
        jax.random.PRNGKey(4), (256, obs_dim)))
    actor = pek.fold_actor_params(cfg, mp, rms)
    log_std = mp["params"]["log_std"]
    B = 1024
    tr = pek.rollout_traj_nv(params, actor, log_std,
                             jnp.asarray(17, jnp.int32), B)
    hi = float(params.max_order_quantity)
    acts = (np.tanh(np.asarray(tr["raw"])[:, 0]) + 1.0) * (0.5 * hi)

    @jax.jit
    def run(econ, acts, dems):
        state, ts0 = jax.vmap(nv.reset_with_econ, in_axes=(None, 1))(
            params, econ)

        def body(state, inp):
            a, d = inp
            state, ts = jax.vmap(nv.step_with_demand,
                                 in_axes=(None, 0, 0, 0))(params, state,
                                                          a[:, None], d)
            return state, (ts.obs, ts.reward)

        state, (obs_seq, rew) = jax.lax.scan(body, state, (acts, dems))
        return jnp.concatenate([ts0.obs[None], obs_seq], axis=0), rew

    obs_all, rew = run(tr["econ"], jnp.asarray(acts), tr["demand"])
    # float env + feedback: numpy/XLA/Mosaic f32 tanh differ by ulps, the
    # action delta compounds through the pipeline for T steps, and the
    # stockout/cap kinks amplify isolated lanes — so compare like the
    # net-family policy pin: overwhelming-majority closeness, not
    # element-exact (the int-state IM pin stays bit-exact)
    close_r = np.isclose(np.asarray(tr["reward"]), np.asarray(rew),
                         rtol=1e-3, atol=2.0)
    assert close_r.mean() > 0.995, close_r.mean()
    orders_chain = np.asarray(obs_all)[1:, :, 5 + params.lead_time - 1]
    close_o = np.isclose(np.asarray(tr["orders"]), orders_chain,
                         rtol=1e-3, atol=2.0)
    assert close_o.mean() > 0.995, close_o.mean()
    got = np.asarray(nv.assemble_obs_from_streams(
        params, tr["econ"], tr["orders"]))
    close_obs = np.isclose(got, np.asarray(obs_all), rtol=1e-3, atol=2.0)
    assert close_obs.mean() > 0.995, close_obs.mean()
    # noise live: lanes explore differently
    assert acts.std(axis=-1).mean() > 0


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_nv_kernel_ppo_update_runs():
    from or_gym_inventory_tpu.envs import newsvendor as nv
    params = nv.default_params(step_limit=12)
    cfg = ppo.PPOConfig(rollout="kernel", num_envs=1024, rollout_steps=12,
                        num_minibatches=4, update_epochs=2,
                        updates_per_call=1)
    U = 2
    update = ppo.make_update_fn(nv.ENV, params, cfg, total_updates=U)
    state = jax.jit(lambda k: ppo.init_train_state(
        nv.ENV, params, cfg, k, U))(jax.random.PRNGKey(0))
    chunk = jax.jit(lambda st, ks: jax.lax.scan(update, st, ks))
    new_state, ms = chunk(state, jax.random.split(jax.random.PRNGKey(1), U))
    for k in ("pg_loss", "v_loss", "entropy", "mean_step_reward"):
        assert np.isfinite(np.asarray(ms[k])).all(), k
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    l1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.abs(np.asarray(l1) - np.asarray(l0)).max() > 0


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_kernel_ppo_trains_under_mesh():
    """rollout='kernel' composes with the data-parallel shard_map path:
    the pallas rollout runs per-shard inside the sharded update (a
    1-device mesh on this container — the composition, seeds-fold and
    replica-identity machinery are what's under test; multi-chip scaling
    needs hardware this container doesn't have)."""
    from or_gym_inventory_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 1  # one attached chip
    params = im.default_params(periods=12)
    cfg = ppo.PPOConfig(rollout="kernel", num_envs=1024, rollout_steps=12,
                        num_minibatches=4, update_epochs=2,
                        updates_per_call=2)
    state, metrics = ppo.train(im.ENV, params, cfg, jax.random.PRNGKey(0),
                               total_timesteps=1024 * 12 * 2, mesh=mesh)
    assert len(metrics["mean_step_reward"]) == 2
    assert np.isfinite(metrics["pg_loss"]).all()


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_kernel_ppo_update_runs_and_learns_signal():
    """Full kernel-rollout PPO: several episode-aligned updates through
    make_update_fn(rollout='kernel') — finite losses, parameters move,
    normalization statistics update."""
    params = im.default_params(periods=12)
    cfg = ppo.PPOConfig(rollout="kernel", num_envs=1024, rollout_steps=12,
                        num_minibatches=4, update_epochs=2,
                        updates_per_call=1)
    U = 3
    update = ppo.make_update_fn(im.ENV, params, cfg, total_updates=U)
    state = jax.jit(lambda k: ppo.init_train_state(
        im.ENV, params, cfg, k, U))(jax.random.PRNGKey(0))
    chunk = jax.jit(lambda st, ks: jax.lax.scan(update, st, ks))
    new_state, ms = chunk(state, jax.random.split(jax.random.PRNGKey(1), U))
    for k in ("pg_loss", "v_loss", "entropy", "mean_step_reward"):
        assert np.isfinite(np.asarray(ms[k])).all(), k
    assert int(np.asarray(ms["episodes"])[0]) == cfg.num_envs
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    l1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.abs(np.asarray(l1) - np.asarray(l0)).max() > 0
    assert float(new_state.rms.count) > float(state.rms.count)
    assert int(new_state.update_idx) == U


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_lstm_traj_kernel_pinned_by_xla_replay():
    """The LSTM trajectory kernel (rollout_traj_im_lstm): replaying the
    dumped (actions, demand) streams through the XLA step_with_demand
    chain reproduces the dumped inv stream (bit-exact int state) and
    rewards; the dumped raws squash to the dumped int actions; the
    exploration noise is live."""
    from or_gym_inventory_tpu.agents import recurrent_ppo as rp
    from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek
    params = im.default_params(periods=12)
    cfg = rp.RecurrentPPOConfig(hidden=64, encoder=(32,))
    model = rp._make_model(im.ENV, params, cfg)
    obs_dim = im.ENV.observation_space(params).shape[0]
    mp = model.init(jax.random.PRNGKey(11), model.initial_carry(1),
                    jnp.zeros((1, obs_dim), jnp.float32))
    rms = rp.RunningMeanStd.create(obs_dim)
    rms = rms.update(50.0 + 20.0 * jax.random.normal(
        jax.random.PRNGKey(12), (256, obs_dim)))
    actor = pek.fold_lstm_actor(cfg, mp, rms)
    log_std = mp["params"]["log_std"]
    B = 1024
    tr = pek.rollout_traj_im_lstm(params, actor, log_std,
                                  jnp.asarray(67, jnp.int32), B)
    acts = np.asarray(tr["actions"])
    dems = np.asarray(tr["demand"])
    obs_all, rew, final_inv = _replay_chain(params, acts, dems)
    inv = np.asarray(tr["inv"])
    np.testing.assert_array_equal(inv[-1], np.asarray(final_inv))
    np.testing.assert_array_equal(
        inv[:-1], np.asarray(obs_all)[:-1, :, :params.m1].transpose(0, 2, 1))
    np.testing.assert_allclose(np.asarray(tr["reward"]), np.asarray(rew),
                               rtol=1e-5, atol=1e-2)
    c = np.asarray(params.c, np.float32)
    a_re = ((np.tanh(np.asarray(tr["raw"]).transpose(0, 2, 1)) + 1.0)
            * 0.5 * c).astype(np.int32)
    assert (a_re == acts.transpose(0, 2, 1)).mean() > 0.999
    assert acts.std(axis=-1).mean() > 0


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_recurrent_kernel_ppo_update_runs_and_learns_signal():
    """Full kernel-rollout recurrent PPO: episode-aligned updates through
    make_train_fns(rollout='kernel') — finite losses, parameters move,
    normalization statistics update, and the trained policy evaluates
    through the carry-threading evaluator."""
    from or_gym_inventory_tpu.agents import recurrent_ppo as rp
    params = im.default_params(periods=12)
    cfg = rp.RecurrentPPOConfig(rollout="kernel", num_envs=1024,
                                rollout_steps=12, num_minibatches=4,
                                update_epochs=2, hidden=64, encoder=(32,))
    U = 3
    init, update, eval_episodes = rp.make_train_fns(im.ENV, params, cfg, U)
    state = jax.jit(init)(jax.random.PRNGKey(0))
    chunk = jax.jit(lambda st, ks: jax.lax.scan(update, st, ks))
    new_state, ms = chunk(state, jax.random.split(jax.random.PRNGKey(1), U))
    for k in ("pg_loss", "v_loss", "entropy", "mean_step_reward"):
        assert np.isfinite(np.asarray(ms[k])).all(), k
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    l1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.abs(np.asarray(l1) - np.asarray(l0)).max() > 0
    assert float(new_state.rms.count) > float(state.rms.count)
    assert int(new_state.update_idx) == U
    totals = jax.jit(eval_episodes, static_argnums=3)(
        new_state.params, new_state.rms, jax.random.PRNGKey(2), 64)
    assert np.isfinite(np.asarray(totals)).all()


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_recurrent_kernel_ppo_trains_under_mesh():
    """RecurrentPPO rollout='kernel' composes with the data-parallel
    shard_map path (1-device mesh on this container)."""
    from or_gym_inventory_tpu.agents import recurrent_ppo as rp
    from or_gym_inventory_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 1
    params = im.default_params(periods=12)
    cfg = rp.RecurrentPPOConfig(rollout="kernel", num_envs=1024,
                                rollout_steps=12, num_minibatches=4,
                                update_epochs=2, hidden=64, encoder=(32,))
    state, _, metrics = rp.train(im.ENV, params, cfg,
                                 jax.random.PRNGKey(0),
                                 total_timesteps=1024 * 12 * 2, mesh=mesh)
    assert len(metrics["mean_step_reward"]) == 2
    assert np.isfinite(np.asarray(metrics["pg_loss"])).all()
