"""Policy-in-kernel InvManagement episode kernel (MXU MLP actor).

The deterministic learned-policy evaluator fused into the episode kernel
(ops/pallas_episode_kernels.episode_returns_im_policy). CPU-side tests pin
the host folding math; the hardware tests pin the kernel three ways:
(a) the dump variant reproduces the plain variant, (b) the dumped
action/demand streams reproduce the returns through the pre-materialized
kernel, (c) the dumped actions match the XLA flax policy applied to the
same rollout (up to int-cast boundary ties).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from or_gym_inventory_tpu.agents import ppo
from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek


def _make_actor(params, cfg, seed=0, train_rms=True):
    model = ppo._make_model(im.ENV, params, cfg)
    obs_dim = im.ENV.observation_space(params).shape[0]
    mp = model.init(jax.random.PRNGKey(seed),
                    jnp.zeros((1, obs_dim), jnp.float32))
    rms = ppo.RunningMeanStd.create(obs_dim)
    if train_rms:
        # non-trivial statistics so the folding is actually exercised
        batch = 50.0 + 20.0 * jax.random.normal(jax.random.PRNGKey(seed + 1),
                                                (256, obs_dim))
        rms = rms.update(batch)
    return mp, rms


def test_fold_actor_params_matches_flax_apply():
    """Folded (Ws, bs) reproduce make_eval_policy's deterministic path:
    normalize -> trunk -> mean head -> squash -> int cast."""
    params = im.default_params(periods=8)
    cfg = ppo.PPOConfig(pi_arch=(64, 64))
    mp, rms = _make_actor(params, cfg)
    Ws, bs = pek.fold_actor_params(cfg, mp, rms)
    obs = jnp.asarray(
        50.0 + 30.0 * jax.random.normal(jax.random.PRNGKey(3), (128, 33)),
        jnp.float32)

    H = obs
    for i, (W, b) in enumerate(zip(Ws, bs)):
        H = H @ W + b
        if i < len(Ws) - 1:
            H = jnp.tanh(H)
    c = jnp.asarray(params.c, jnp.float32)
    a_fold = ((jnp.tanh(H) + 1.0) * 0.5 * c).astype(jnp.int32)

    policy = ppo.make_eval_policy(im.ENV, params, cfg, deterministic=True)
    a_ref = policy((mp, rms), obs, jax.random.PRNGKey(0),
                   jnp.zeros((), jnp.int32))
    # identical up to f32 association differences at int-cast boundaries
    assert (np.asarray(a_fold) == np.asarray(a_ref)).mean() > 0.999


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_im_policy_kernel_pinned_three_ways():
    params = im.default_params(periods=12)
    cfg = ppo.PPOConfig(pi_arch=(64, 64))
    mp, rms = _make_actor(params, cfg)
    actor = pek.fold_actor_params(cfg, mp, rms)
    seed = jnp.asarray(23, jnp.int32)
    B = 1024

    rew_d, acts, dems = pek.sample_policy_streams_debug_im(
        params, actor, seed, B, block=1024)
    fused = np.asarray(pek.episode_returns_im_policy(params, actor, seed, B,
                                                     block=1024))
    # (a) dump variant == plain variant (identical PRNG consumption)
    np.testing.assert_allclose(np.asarray(rew_d), fused, rtol=1e-6, atol=1e-4)

    # (b) dumped streams reproduce through the pre-materialized kernel
    pre = np.asarray(pek.episode_returns_im(params, acts[:, 0], dems[:, 0],
                                            block=512))
    np.testing.assert_allclose(fused, pre, rtol=1e-5, atol=1e-3)

    # (c) the XLA flax policy on the same demand stream produces the same
    # actions and matching returns on tie-free lanes. BOTH sides run their
    # matmuls at HIGHEST precision here: at the TPU default (bf16-class f32
    # passes) the two implementations' ~1e-3-relative matmul rounding makes
    # int-cast boundary ties common enough to cascade through trajectories
    # (~0.5% of actions); at full-f32 the residual association differences
    # are ~1e-6 and ties all but vanish.
    rew_hp, acts_hp, dems_hp = pek.sample_policy_streams_debug_im(
        params, actor, seed, B, block=1024,
        precision=jax.lax.Precision.HIGHEST)
    policy = ppo.make_eval_policy(im.ENV, params, cfg, deterministic=True)
    ps = (mp, rms)

    @jax.jit
    def xla_chain(dems_eb):
        Bb = dems_eb.shape[1]
        state = jax.vmap(lambda _: im.reset(params)[0])(jnp.arange(Bb))
        obs0 = jax.vmap(lambda s: im._obs(params, s))(state)

        def body(carry, d):
            state, obs = carry
            a = policy(ps, obs, jax.random.PRNGKey(0), jnp.zeros((), jnp.int32))
            state, ts = jax.vmap(im.step_with_demand,
                                 in_axes=(None, 0, 0, 0))(params, state, a, d)
            return (state, ts.obs), (a, ts.reward)

        _, (a_seq, r_seq) = jax.lax.scan(body, (state, obs0), dems_eb)
        return a_seq, r_seq.sum(axis=0)

    with jax.default_matmul_precision("highest"):
        a_xla, ret_xla = xla_chain(jnp.asarray(dems_hp[:, 0]))
    a_kern = np.asarray(acts_hp[:, 0]).transpose(0, 2, 1)  # (T, B, m1)
    same = (np.asarray(a_xla) == a_kern)
    assert same.mean() > 0.999, same.mean()
    clean = same.all(axis=(0, 2))  # lanes with zero action divergence
    assert clean.mean() > 0.99
    np.testing.assert_allclose(np.asarray(rew_hp)[clean],
                               np.asarray(ret_xla)[clean],
                               rtol=1e-4, atol=1e-2)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_net_policy_kernel_pinned_three_ways():
    """The NetInvMgmt policy-in-kernel evaluator (same recipe as IM; float
    actions, no int-cast cliffs — so the XLA comparison can demand near-
    universal agreement of returns at HIGHEST precision)."""
    from or_gym_inventory_tpu.envs import net_inv_management as net
    from or_gym_inventory_tpu.ops import pallas_net_step as pns
    params = net.default_params(num_periods=10)
    cfg = ppo.PPOConfig(pi_arch=(64, 64))
    obs_dim = net.ENV.observation_space(params).shape[0]
    model = ppo._make_model(net.ENV, params, cfg)
    mp = model.init(jax.random.PRNGKey(7),
                    jnp.zeros((1, obs_dim), jnp.float32))
    rms = ppo.RunningMeanStd.create(obs_dim)
    rms = rms.update(100.0 + 40.0 * jax.random.normal(
        jax.random.PRNGKey(8), (256, obs_dim)))
    actor = pek.fold_actor_params(cfg, mp, rms)
    seed = jnp.asarray(41, jnp.int32)
    B = 1024

    rew_d, acts, dems = pns.sample_policy_streams_debug_net(
        params, actor, seed, B, block=1024)
    fused = np.asarray(pns.episode_returns_net_policy(params, actor, seed,
                                                      B, block=1024))
    # (a) dump variant == plain variant
    np.testing.assert_allclose(np.asarray(rew_d), fused, rtol=1e-6,
                               atol=1e-4)
    # (b) dumped streams reproduce through the pre-materialized kernel
    pre = np.asarray(pns.episode_returns(params, acts[:, 0], dems[:, 0],
                                         block=512))
    np.testing.assert_allclose(fused, pre, rtol=1e-5, atol=1e-3)

    # (c) XLA flax policy on the same demand stream, both sides HIGHEST
    rew_hp, acts_hp, dems_hp = pns.sample_policy_streams_debug_net(
        params, actor, seed, B, block=1024,
        precision=jax.lax.Precision.HIGHEST)
    policy = ppo.make_eval_policy(net.ENV, params, cfg, deterministic=True)
    ps = (mp, rms)

    @jax.jit
    def xla_chain(dems_eb):
        Bb = dems_eb.shape[2]
        state = jax.vmap(lambda _: net.reset(params)[0])(jnp.arange(Bb))
        obs0 = jax.vmap(lambda s: net._obs(params, s))(state)

        def body(carry, d):
            state, obs = carry
            a = policy(ps, obs, jax.random.PRNGKey(0),
                       jnp.zeros((), jnp.int32))
            state, ts = jax.vmap(net.step_with_demand,
                                 in_axes=(None, 0, 0, 1))(params, state, a, d)
            return (state, ts.obs), ts.reward

        _, r_seq = jax.lax.scan(body, (state, obs0), dems_eb)
        return r_seq.sum(axis=0)

    with jax.default_matmul_precision("highest"):
        ret_xla = xla_chain(jnp.asarray(dems_hp[:, 0]))
    # continuous actions round only at the env's jnp.round — isolated
    # half-integer ties; overwhelming majority of lanes must agree
    close = np.isclose(np.asarray(rew_hp), np.asarray(ret_xla), rtol=1e-3,
                       atol=1.0)
    assert close.mean() > 0.99, close.mean()


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_nv_policy_kernel_pinned():
    """The Newsvendor policy kernel (reset + demand + actor all fused):
    dump variant == plain variant; dumped econ/action/demand streams
    reproduce through the pre-materialized kernel; dumped econ satisfies
    the reset constraints; actions lie in the squashed box."""
    from or_gym_inventory_tpu.envs import newsvendor as nv
    params = nv.default_params(step_limit=12)
    cfg = ppo.PPOConfig(pi_arch=(64, 64))
    obs_dim = nv.ENV.observation_space(params).shape[0]
    model = ppo._make_model(nv.ENV, params, cfg)
    mp = model.init(jax.random.PRNGKey(9),
                    jnp.zeros((1, obs_dim), jnp.float32))
    rms = ppo.RunningMeanStd.create(obs_dim)
    rms = rms.update(60.0 + 25.0 * jax.random.normal(
        jax.random.PRNGKey(10), (256, obs_dim)))
    actor = pek.fold_actor_params(cfg, mp, rms)
    seed = jnp.asarray(53, jnp.int32)
    B = 1024
    rew_d, econ, acts, dems = pek.sample_policy_streams_debug_nv(
        params, actor, seed, B, block=1024)
    fused = np.asarray(pek.episode_returns_nv_policy(params, actor, seed,
                                                     B, block=1024))
    np.testing.assert_allclose(np.asarray(rew_d), fused, rtol=1e-6,
                               atol=1e-4)
    pre = np.asarray(pek.episode_returns_nv(params, econ[0], acts[:, 0],
                                            dems[:, 0], block=512))
    np.testing.assert_allclose(fused, pre, rtol=1e-5, atol=1e-3)
    e = np.asarray(econ[0])
    assert (e[0] >= 1.0).all() and (e[1] <= np.maximum(e[0], 1.0)).all()
    assert (e[4] >= 0).all() and (e[4] <= params.mu_max).all()
    a = np.asarray(acts)
    assert a.min() >= 0.0 and a.max() <= params.max_order_quantity
    # the policy is state-dependent: actions vary across lanes/periods
    assert a.std() > 0


def _make_lstm_actor(params, cfg, seed=0):
    from or_gym_inventory_tpu.agents import recurrent_ppo as rppo
    model = rppo._make_model(im.ENV, params, cfg)
    obs_dim = im.ENV.observation_space(params).shape[0]
    c0 = model.initial_carry(1)
    mp = model.init(jax.random.PRNGKey(seed), c0,
                    jnp.zeros((1, obs_dim), jnp.float32))
    rms = ppo.RunningMeanStd.create(obs_dim)
    rms = rms.update(50.0 + 20.0 * jax.random.normal(
        jax.random.PRNGKey(seed + 1), (256, obs_dim)))
    return model, mp, rms


def test_fold_lstm_actor_matches_flax_apply():
    """fold_lstm_actor's arrays reproduce one flax LSTMActorCritic step:
    normalize -> encoder -> OptimizedLSTMCell -> mean head."""
    from or_gym_inventory_tpu.agents import recurrent_ppo as rppo
    params = im.default_params(periods=6)
    cfg = rppo.RecurrentPPOConfig(hidden=16, encoder=(24,))
    model, mp, rms = _make_lstm_actor(params, cfg)
    actor = pek.fold_lstm_actor(cfg, mp, rms)
    hidden = 16
    B = 32
    obs = jnp.asarray(50.0 + 30.0 * jax.random.normal(
        jax.random.PRNGKey(3), (B, 33)), jnp.float32)
    H0 = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (B, hidden))
    C0 = 0.3 * jax.random.normal(jax.random.PRNGKey(5), (B, hidden))

    # folded math (the kernel's computation, XLA layout)
    X = obs
    for W, b in actor["enc"]:
        X = jnp.tanh(X @ W.T + b.T)
    G = X @ actor["wx"].T + H0 @ actor["wh"].T + actor["bh"].T
    i = jax.nn.sigmoid(G[:, :hidden])
    f = jax.nn.sigmoid(G[:, hidden:2 * hidden])
    g = jnp.tanh(G[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(G[:, 3 * hidden:])
    C1 = f * C0 + i * g
    H1 = o * jnp.tanh(C1)
    mean_fold = H1 @ actor["wm"].T + actor["bm"].T

    (c_ref, h_ref), (mean_ref, _, _) = model.apply(
        mp, (jnp.asarray(C0), jnp.asarray(H0)), rms.normalize(obs))
    np.testing.assert_allclose(np.asarray(mean_fold), np.asarray(mean_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(C1), np.asarray(c_ref),
                               rtol=2e-5, atol=2e-5)


def test_lstm_policy_episode_returns_xla_fallback():
    from or_gym_inventory_tpu.agents import recurrent_ppo as rppo
    from or_gym_inventory_tpu.vector import fast_episodes
    params = im.default_params(periods=6)
    cfg = rppo.RecurrentPPOConfig(hidden=8, encoder=(8,))
    _model, mp, rms = _make_lstm_actor(params, cfg)
    actor = pek.fold_lstm_actor(cfg, mp, rms)
    r = np.asarray(fast_episodes.lstm_policy_episode_returns(
        params, actor, jax.random.PRNGKey(0), 32, use_pallas=False))
    assert r.shape == (32,) and np.isfinite(r).all()


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_im_lstm_policy_kernel_pinned():
    """The LSTM-policy-in-kernel evaluator: dump == plain; the dumped
    action/demand streams reproduce the returns through the
    pre-materialized kernel; the XLA flax chain on the same demand stream
    produces the same actions (HIGHEST precision both sides)."""
    from or_gym_inventory_tpu.agents import recurrent_ppo as rppo
    params = im.default_params(periods=12)
    cfg = rppo.RecurrentPPOConfig(hidden=128, encoder=(64,))
    model, mp, rms = _make_lstm_actor(params, cfg)
    actor = pek.fold_lstm_actor(cfg, mp, rms)
    seed = jnp.asarray(71, jnp.int32)
    B = 1024
    rew_d, acts, dems = pek.sample_lstm_streams_debug_im(
        params, actor, seed, B, block=1024)
    fused = np.asarray(pek.episode_returns_im_lstm(params, actor, seed, B,
                                                   block=1024))
    np.testing.assert_allclose(np.asarray(rew_d), fused, rtol=1e-6,
                               atol=1e-4)
    pre = np.asarray(pek.episode_returns_im(params, acts, dems, block=512))
    np.testing.assert_allclose(fused, pre, rtol=1e-5, atol=1e-3)

    # XLA flax chain on the same demand stream, both sides HIGHEST
    rew_hp, acts_hp, dems_hp = pek.sample_lstm_streams_debug_im(
        params, actor, seed, B, block=1024,
        precision=jax.lax.Precision.HIGHEST)
    c = jnp.asarray(params.c, jnp.float32)

    @jax.jit
    def xla_chain(dems_tb):
        Bb = dems_tb.shape[1]
        state = jax.vmap(lambda _: im.reset(params)[0])(jnp.arange(Bb))
        obs0 = jax.vmap(lambda s: im._obs(params, s))(state)
        carry0 = model.initial_carry(Bb)

        def body(carry, d):
            state, obs, lstm_c = carry
            lstm_c, (mean, _, _) = model.apply(mp, lstm_c,
                                               rms.normalize(obs))
            a = ((jnp.tanh(mean) + 1.0) * 0.5 * c).astype(jnp.int32)
            state, ts = jax.vmap(im.step_with_demand,
                                 in_axes=(None, 0, 0, 0))(params, state,
                                                          a, d)
            return (state, ts.obs, lstm_c), a

        _, a_seq = jax.lax.scan(body, (state, obs0, carry0), dems_tb)
        return a_seq

    with jax.default_matmul_precision("highest"):
        a_xla = xla_chain(jnp.asarray(dems_hp))
    a_kern = np.asarray(acts_hp).transpose(0, 2, 1)
    same = (np.asarray(a_xla) == a_kern)
    assert same.mean() > 0.999, same.mean()
    # recurrence is live: hidden state shapes behavior over time
    assert np.asarray(acts).std(axis=0).mean() > 0


def test_stochastic_eval_requires_log_std():
    from or_gym_inventory_tpu.vector import fast_episodes
    params = im.default_params(periods=4)
    cfg = ppo.PPOConfig(pi_arch=(32,))
    mp, rms = _make_actor(params, cfg)
    actor = pek.fold_actor_params(cfg, mp, rms)
    with pytest.raises(ValueError, match="log_std"):
        fast_episodes.policy_episode_returns(
            params, actor, jax.random.PRNGKey(0), 64, deterministic=False)


def test_xla_stochastic_fallback_samples():
    """The non-TPU stochastic path: tanh-squashed Gaussian actions around
    the folded-actor mean (networks.gaussian_sample semantics) — finite
    returns, key-dependent, distinct from the deterministic policy."""
    from or_gym_inventory_tpu.vector import fast_episodes
    params = im.default_params(periods=6)
    cfg = ppo.PPOConfig(pi_arch=(32,))
    mp, rms = _make_actor(params, cfg)
    actor = pek.fold_actor_params(cfg, mp, rms)
    log_std = mp["params"]["log_std"]
    r_det = np.asarray(fast_episodes.policy_episode_returns(
        params, actor, jax.random.PRNGKey(1), 64, use_pallas=False))
    r_sto = np.asarray(fast_episodes.policy_episode_returns(
        params, actor, jax.random.PRNGKey(1), 64, use_pallas=False,
        deterministic=False, log_std=log_std))
    r_sto2 = np.asarray(fast_episodes.policy_episode_returns(
        params, actor, jax.random.PRNGKey(2), 64, use_pallas=False,
        deterministic=False, log_std=log_std))
    assert np.isfinite(r_sto).all() and np.isfinite(r_sto2).all()
    assert np.abs(r_sto - r_det).max() > 0       # noise actually applied
    assert np.abs(r_sto - r_sto2).max() > 0      # key-dependent
    # two independent noise keys draw from the same return distribution
    se = (r_sto.std() ** 2 / 64 + r_sto2.std() ** 2 / 64) ** 0.5
    assert abs(r_sto.mean() - r_sto2.mean()) < 8 * se


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_in_kernel_normals_gof():
    """Goodness-of-fit of the in-kernel Box-Muller sampler: 1M dumped
    normals match N(0,1) in moments and KS distance, with the documented
    sqrt(48 ln 2) tail cap from the 24-bit uniform."""
    import math
    z = np.asarray(pek.sample_normals_debug(jnp.asarray(3, jnp.int32),
                                            rows=64, batch=16384)).ravel()
    n = z.size
    assert n == 64 * 16384
    assert abs(z.mean()) < 5.0 / math.sqrt(n)
    assert abs(z.std() - 1.0) < 0.005
    assert abs(((z - z.mean()) ** 3).mean()) < 0.02          # skew
    assert abs(((z - z.mean()) ** 4).mean() - 3.0) < 0.06    # kurtosis
    assert np.abs(z).max() <= math.sqrt(48 * math.log(2)) + 1e-3
    # one-sample KS against Phi (via erf); critical value at n=1M is
    # ~0.0014 (5%) — allow 4x for the 24-bit discretization
    zs = np.sort(z)
    cdf = 0.5 * (1.0 + np.vectorize(math.erf)(zs / math.sqrt(2.0)))
    emp_hi = np.arange(1, n + 1) / n
    emp_lo = np.arange(0, n) / n
    ks = max(np.abs(emp_hi - cdf).max(), np.abs(emp_lo - cdf).max())
    assert ks < 0.006, ks


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_im_stochastic_policy_kernel_pinned():
    """Stochastic policy-in-kernel eval: dump == plain for the same seed;
    the dumped (noisy) action/demand streams reproduce the returns through
    the pre-materialized kernel; the sampled-return distribution matches
    the XLA stochastic rollout (same folded actor + log_std, independent
    noise streams)."""
    params = im.default_params(periods=12)
    cfg = ppo.PPOConfig(pi_arch=(64, 64))
    mp, rms = _make_actor(params, cfg)
    actor = pek.fold_actor_params(cfg, mp, rms)
    log_std = jnp.full((params.m1,), -0.7, jnp.float32)
    seed = jnp.asarray(61, jnp.int32)
    B = 4096

    rew_d, acts, dems = pek.sample_policy_streams_debug_im(
        params, actor, seed, B, block=1024, log_std=log_std)
    fused = np.asarray(pek.episode_returns_im_policy(
        params, actor, seed, B, block=1024, log_std=log_std))
    np.testing.assert_allclose(np.asarray(rew_d), fused, rtol=1e-6,
                               atol=1e-4)
    pre = np.asarray(pek.episode_returns_im(params, acts[:, 0], dems[:, 0],
                                            block=512))
    np.testing.assert_allclose(fused, pre, rtol=1e-5, atol=1e-3)

    det = np.asarray(pek.episode_returns_im_policy(params, actor, seed, B,
                                                   block=1024))
    assert np.abs(det - fused).max() > 0  # the noise is actually applied

    # distributional match vs the XLA stochastic rollout
    from or_gym_inventory_tpu.vector import fast_episodes
    xla = np.asarray(fast_episodes.policy_episode_returns(
        params, actor, jax.random.PRNGKey(5), B, use_pallas=False,
        deterministic=False, log_std=log_std))
    se = (fused.std() ** 2 / B + xla.std() ** 2 / B) ** 0.5
    assert abs(fused.mean() - xla.mean()) < 6 * se, (
        fused.mean(), xla.mean(), se)
    assert 0.8 < fused.std() / xla.std() < 1.25


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG needed (no interpret lowering)")
def test_im_policy_kernel_interleaved():
    params = im.default_params(periods=10)
    cfg = ppo.PPOConfig(pi_arch=(64, 64))
    mp, rms = _make_actor(params, cfg, seed=4)
    actor = pek.fold_actor_params(cfg, mp, rms)
    seed = jnp.asarray(31, jnp.int32)
    B, E = 1024, 2
    rew, acts, dems = pek.sample_policy_streams_debug_im(
        params, actor, seed, B, block=1024, episodes_per_lane=E)
    assert np.asarray(rew).shape == (E, B)
    for e in range(E):
        pre = np.asarray(pek.episode_returns_im(params, acts[:, e],
                                                dems[:, e], block=512))
        np.testing.assert_allclose(np.asarray(rew)[e], pre, rtol=1e-5,
                                   atol=1e-3)
    # same policy, independent demand -> different returns across episodes
    assert np.abs(np.asarray(rew)[0] - np.asarray(rew)[1]).max() > 0
