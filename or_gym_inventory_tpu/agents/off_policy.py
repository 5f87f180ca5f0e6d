"""Off-policy actor-learners: SAC, TD3, DDPG with an on-device replay buffer.

Covers the reference's off-policy roster (SB3 SAC/TD3/DDPG with action noise,
benchmark_InvManagementBacklogEnv.py:215-229, 692-717) TPU-natively: the
replay buffer is a fixed-size pytree living in HBM, env stepping and gradient
updates fuse into one jitted iteration, and everything batches — no python
in the hot loop.

One shared core (`make_offpolicy_update`) parameterized by algorithm:
- DDPG: deterministic actor, single Q, target polyak.
- TD3:  + twin critics, target policy smoothing, delayed actor updates.
- SAC:  stochastic tanh-Gaussian actor, twin critics, entropy temperature
        with automatic tuning (target entropy = -act_dim).

Action convention (matches SB3): the replay buffer and critics operate on
the tanh-squashed NORMALIZED action in [-1, 1]; the env action is the linear
rescale of that. Exploration noise for DDPG/TD3 is added in normalized
space post-squash and clipped — exactly the reference's scale heuristic
(sigma = 0.1 = 0.1 * action_range / 2 in [-1, 1] coordinates,
benchmark_InvManagementBacklogEnv.py:225). Pre-squash noise would die
whenever the actor saturates tanh, which is what collapsed DDPG on the
lost-sales benchmark in round 1 (VERDICT weak #5).
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization, struct

from or_gym_inventory_tpu.agents import networks
from or_gym_inventory_tpu.agents.base import (BaseAgent,
                                              ckpt_trained_timesteps,
                                              write_ckpt_meta)
from or_gym_inventory_tpu.agents.ppo import RunningMeanStd
from or_gym_inventory_tpu.envs.base import Environment
from or_gym_inventory_tpu.vector import vecenv


@struct.dataclass
class OffPolicyConfig:
    algo: str = struct.field(pytree_node=False, default="sac")  # sac|td3|ddpg
    num_envs: int = struct.field(pytree_node=False, default=128)
    buffer_size: int = struct.field(pytree_node=False, default=200_000)
    batch_size: int = struct.field(pytree_node=False, default=256)
    lr: float = struct.field(pytree_node=False, default=3e-4)
    gamma: float = struct.field(pytree_node=False, default=0.99)
    tau: float = struct.field(pytree_node=False, default=0.005)
    start_steps: int = struct.field(pytree_node=False, default=2_000)
    updates_per_iter: int = struct.field(pytree_node=False, default=1)
    policy_delay: int = struct.field(pytree_node=False, default=2)   # td3
    target_noise: float = struct.field(pytree_node=False, default=0.2)
    noise_clip: float = struct.field(pytree_node=False, default=0.5)
    explore_noise: float = struct.field(pytree_node=False, default=0.1)
    # DDPG/TD3 deterministic actors: penalty on the pre-tanh mean magnitude
    # in the actor loss. The actor gradient carries a (1 - tanh^2) factor,
    # so once the mean saturates the policy is stuck at an action-space
    # corner no matter what the critics learn; a small quadratic penalty on
    # the excess over |mean|>1 keeps the actor in the responsive region.
    # (SAC's stochastic actor self-regularizes via the entropy term.)
    pretanh_penalty: float = struct.field(pytree_node=False, default=1e-3)
    n_step: int = struct.field(pytree_node=False, default=1)
    pi_arch: Tuple[int, ...] = struct.field(pytree_node=False, default=(256, 256))
    q_arch: Tuple[int, ...] = struct.field(pytree_node=False, default=(256, 256))
    normalize_obs: bool = struct.field(pytree_node=False, default=True)
    # Experience-collection backend. "xla": one fused policy+env step per
    # iteration (works everywhere). "kernel": EPISODE-CHUNKED collection
    # through the trajectory-emitting Pallas rollouts (the off-policy
    # analogue of PPOConfig(rollout="kernel")): each iteration runs one
    # full episode per env in-kernel — relu actor trunk on the MXU,
    # exploration on-core (TD3/DDPG: SB3-style post-squash clipped noise;
    # SAC: squashed state-dependent Gaussian; warmup: uniform) — inserts
    # all num_envs*horizon transitions, then runs horizon*updates_per_iter
    # gradient updates (the SAME update:env-step ratio as the XLA path's
    # per-step interleave; only the data ordering is chunked). TPU-only;
    # num_envs % 1024 == 0; buffer_size must hold one collection chunk
    # (capacity is rounded down to a whole number of chunks so the ring
    # write stays a contiguous DMA — see ReplayBuffer.insert_chunk).
    collect: str = struct.field(pytree_node=False, default="xla")


class _Actor(networks.nn.Module):
    action_dim: int
    arch: Tuple[int, ...] = (256, 256)
    stochastic: bool = True

    @networks.nn.compact
    def __call__(self, obs):
        x = obs
        for w in self.arch:
            x = networks.nn.relu(networks.nn.Dense(w)(x))
        mean = networks.nn.Dense(self.action_dim)(x)
        if not self.stochastic:
            return mean, None
        log_std = networks.nn.Dense(self.action_dim)(x)
        log_std = jnp.clip(log_std, -10.0, 2.0)
        return mean, log_std


@struct.dataclass
class ReplayBuffer:
    obs: jax.Array
    action: jax.Array      # normalized (post-squash) actions in [-1, 1]^d
    reward: jax.Array      # n-step discounted reward sum (plain reward, n=1)
    next_obs: jax.Array    # obs after the last transition in the n-window
    done: jax.Array
    disc: jax.Array        # bootstrap discount gamma^k for this transition
    ptr: jax.Array
    filled: jax.Array

    @classmethod
    def create(cls, size: int, obs_dim: int, act_dim: int):
        return cls(obs=jnp.zeros((size, obs_dim), jnp.float32),
                   action=jnp.zeros((size, act_dim), jnp.float32),
                   reward=jnp.zeros((size,), jnp.float32),
                   next_obs=jnp.zeros((size, obs_dim), jnp.float32),
                   done=jnp.zeros((size,), jnp.bool_),
                   disc=jnp.zeros((size,), jnp.float32),
                   ptr=jnp.zeros((), jnp.int32),
                   filled=jnp.zeros((), jnp.int32))

    def insert(self, obs, action, reward, next_obs, done, disc):
        n = obs.shape[0]
        size = self.obs.shape[0]
        idx = (self.ptr + jnp.arange(n)) % size
        return self.replace(
            obs=self.obs.at[idx].set(obs.astype(jnp.float32)),
            action=self.action.at[idx].set(action),
            reward=self.reward.at[idx].set(reward),
            next_obs=self.next_obs.at[idx].set(next_obs.astype(jnp.float32)),
            done=self.done.at[idx].set(done),
            disc=self.disc.at[idx].set(disc),
            ptr=(self.ptr + n) % size,
            filled=jnp.minimum(self.filled + n, size))

    def insert_chunk(self, obs, action, reward, next_obs, done, disc):
        """Contiguous ring insert for the kernel-collection path: the
        chunk size and capacity are STATIC with ``size % n == 0`` (the
        pointer stays chunk-aligned, so the write never wraps mid-chunk)
        and the write lowers to ``dynamic_update_slice`` — a straight DMA
        instead of the row-scatter ``insert`` pays (measured 686 ms vs
        25 ms for a 1.97M-row chunk; the scatter was the entire
        throughput gap of the first kernel-collection measurement)."""
        n = obs.shape[0]
        size = self.obs.shape[0]
        assert size % n == 0, (
            f"insert_chunk needs capacity ({size}) % chunk ({n}) == 0")
        p = self.ptr
        return self.replace(
            obs=jax.lax.dynamic_update_slice(
                self.obs, obs.astype(jnp.float32), (p, 0)),
            action=jax.lax.dynamic_update_slice(self.action, action, (p, 0)),
            reward=jax.lax.dynamic_update_slice(self.reward, reward, (p,)),
            next_obs=jax.lax.dynamic_update_slice(
                self.next_obs, next_obs.astype(jnp.float32), (p, 0)),
            done=jax.lax.dynamic_update_slice(self.done, done, (p,)),
            disc=jax.lax.dynamic_update_slice(self.disc, disc, (p,)),
            ptr=(p + n) % size,
            filled=jnp.minimum(self.filled + n, size))

    def sample(self, key, batch_size: int):
        idx = jax.random.randint(key, (batch_size,), 0,
                                 jnp.maximum(self.filled, 1))
        return dict(obs=self.obs[idx], action=self.action[idx],
                    reward=self.reward[idx], next_obs=self.next_obs[idx],
                    done=self.done[idx], disc=self.disc[idx])


def nstep_aggregate(wrew, wdone, wnext, gamma: float):
    """Collapse an oldest-first window of transitions into one n-step
    transition for the window's first entry.

    ``wrew``/``wdone`` are (n, B); ``wnext`` is (n, B, obs_dim) holding the
    post-step observation of each transition. A ``done`` inside the window
    cuts the return there (entries after the first done belong to the next
    episode and are excluded). Returns (reward_n (B,), next_obs (B, obs_dim),
    done (B,), disc (B,)) where ``disc = gamma^k`` with k = included steps,
    so the TD target is ``reward_n + disc * Q(next_obs)`` (envs here are
    truncation-only, so bootstrapping at the cut is always correct).
    """
    n = wrew.shape[0]
    d = wdone.astype(jnp.float32)
    # include[i] = 1 iff no done strictly before entry i (prefix mask)
    no_done_before = jnp.cumprod(1.0 - d, axis=0)
    include = jnp.concatenate([jnp.ones_like(d[:1]), no_done_before[:-1]], 0)
    gammas = (gamma ** jnp.arange(n, dtype=jnp.float32))[:, None]
    reward_n = jnp.sum(include * gammas * wrew, axis=0)
    k = jnp.sum(include, axis=0)                     # steps included, >= 1
    # one-hot of the last included entry: include[i] * (1 - include[i+1])
    inc_next = jnp.concatenate([include[1:], jnp.zeros_like(include[:1])], 0)
    sel = include * (1.0 - inc_next)                 # (n, B)
    next_obs = jnp.sum(sel[:, :, None] * wnext, axis=0)
    done = jnp.sum(sel * d, axis=0) > 0.5
    return reward_n, next_obs, done, gamma ** k


def episode_transitions(obs_all, a_norm, reward, n_step: int, gamma: float):
    """Collapse one fixed-horizon episode batch into flat n-step replay
    transitions, oldest-first (the kernel-collection analogue of the XLA
    path's rolling ``nstep_aggregate`` window — equivalence pinned by
    tests/test_kernel_collect.py).

    ``obs_all`` (T+1, B, D) raw observations incl. the final snapshot;
    ``a_norm`` (T, B, A) normalized actions; ``reward`` (T, B). Episodes
    are aligned (these envs are fixed-horizon, truncation-only), so the
    n-step window cuts ONLY at the horizon: with k(t) = min(n, T - t),
    ``reward_n[t] = sum_{j<k} gamma^j r[t+j]``, ``next_obs[t] =
    obs[t+k]``, ``done[t] = (t + k == T)`` (the last included transition
    is the truncation step) and ``disc[t] = gamma^k``. Returns the
    (T*B, ...) tuple ``(obs, action, reward_n, next_obs, done, disc)``
    in t-major order (oldest first — ring-buffer recency matches the
    step-interleaved path)."""
    T, B = reward.shape
    n = min(n_step, T)
    t_idx = np.arange(T)
    k = np.minimum(n, T - t_idx)
    rew_pad = jnp.concatenate(
        [reward, jnp.zeros((n - 1, B), reward.dtype)], 0) \
        if n > 1 else reward
    reward_n = sum((gamma ** j) * rew_pad[j:j + T] for j in range(n))
    next_obs = obs_all[np.minimum(t_idx + n, T)]          # obs[t + k(t)]
    done = jnp.broadcast_to(
        jnp.asarray((t_idx + k) == T)[:, None], (T, B))
    disc = jnp.broadcast_to(
        jnp.asarray(gamma ** k, jnp.float32)[:, None], (T, B))
    D = obs_all.shape[-1]
    A = a_norm.shape[-1]
    return (obs_all[:T].reshape(T * B, D), a_norm.reshape(T * B, A),
            reward_n.reshape(T * B), next_obs.reshape(T * B, D),
            done.reshape(T * B), disc.reshape(T * B))


@struct.dataclass
class OffPolicyState:
    actor_params: dict
    q_params: dict            # twin critics stacked under one tree
    target_q_params: dict
    target_actor_params: dict
    log_alpha: jax.Array      # sac temperature
    actor_opt: optax.OptState
    q_opt: optax.OptState
    alpha_opt: optax.OptState
    rms: RunningMeanStd
    buffer: ReplayBuffer
    env_state: object
    last_obs: jax.Array
    step_idx: jax.Array
    window: dict              # rolling n-step window, oldest-first (n=1: size-1)


def make_offpolicy(env: Environment, env_params, cfg: OffPolicyConfig,
                   axis_name: Optional[str] = None,
                   local_envs: Optional[int] = None):
    """Build (init_fn, update_fn, eval_policy) for the configured algorithm.

    With ``axis_name`` set (inside shard_map), the env batch, n-step window,
    and replay buffer are per-shard (``local_envs`` envs and a
    proportionally-sized buffer slice each); params/opt-state are replicated
    and gradients/normalization statistics psum over the mesh — the same
    data-parallel layout as agents/ppo.py. Each shard samples its own
    ``batch_size`` minibatch and the pmean'd gradient is equivalent to one
    ``batch_size * n_devices`` step.
    """
    if cfg.n_step < 1:
        raise ValueError(f"n_step must be >= 1, got {cfg.n_step}")
    n_local = local_envs or cfg.num_envs
    buffer_local = cfg.buffer_size * n_local // cfg.num_envs
    space = env.action_space(env_params)
    obs_dim = env.observation_space(env_params).shape[0]
    act_dim = int(np.prod(space.shape))
    low = jnp.asarray(space.low, jnp.float32)
    high = jnp.asarray(np.where(np.isinf(space.high), 1e4, space.high), jnp.float32)
    int_actions = np.issubdtype(space.dtype, np.integer)
    stochastic = cfg.algo == "sac"

    actor = _Actor(action_dim=act_dim, arch=cfg.pi_arch, stochastic=stochastic)

    class TwinQ(networks.nn.Module):
        @networks.nn.compact
        def __call__(self, obs, act):
            q1 = networks.QNetwork(arch=cfg.q_arch)(obs, act)
            if cfg.algo == "ddpg":
                return q1, q1
            q2 = networks.QNetwork(arch=cfg.q_arch)(obs, act)
            return q1, q2

    twin_q = TwinQ()
    actor_tx = optax.adam(cfg.lr)
    q_tx = optax.adam(cfg.lr)
    alpha_tx = optax.adam(cfg.lr)
    target_entropy = -float(act_dim)

    def to_env_action(a_norm):
        # linear rescale of the normalized action; to_env_action(tanh(raw))
        # == networks.squash_action(raw, low, high)
        a = low + (a_norm + 1.0) * 0.5 * (high - low)
        return a.astype(jnp.int32) if int_actions else a

    if cfg.collect not in ("xla", "kernel"):
        raise ValueError(f"collect must be 'xla' or 'kernel', got "
                         f"{cfg.collect!r}")
    if cfg.collect == "kernel":
        fam = getattr(env, "name", None)
        if fam not in ("inv_management", "newsvendor", "net_inv_management"):
            raise NotImplementedError(
                "collect='kernel' supports the InvManagement, Newsvendor "
                f"and NetInvMgmt families (got {fam!r})")
        horizon = env.horizon(env_params)
        if n_local % 1024:
            raise ValueError(
                "collect='kernel' needs num_envs to be a multiple of 1024 "
                f"(the kernel block size); got {n_local}. Under a mesh the "
                "PER-SHARD env count (num_envs / devices) must be a "
                "multiple of 1024.")
        if cfg.n_step > horizon:
            raise ValueError(
                f"collect='kernel' runs episode-aligned collection: n_step "
                f"({cfg.n_step}) cannot exceed the env horizon ({horizon})")
        if buffer_local < n_local * horizon:
            raise ValueError(
                "collect='kernel' inserts num_envs * horizon transitions "
                f"per iteration ({n_local} * {horizon} = "
                f"{n_local * horizon} per shard); buffer_size must hold at "
                f"least one collection chunk (got {buffer_local} per shard)")
        if jax.default_backend() != "tpu":
            raise RuntimeError(
                "collect='kernel' needs the TPU backend (Pallas trajectory "
                "kernels); use collect='xla' elsewhere")
        # round the capacity DOWN to a whole number of collection chunks:
        # insert_chunk's chunk-aligned pointer turns the ring write into a
        # contiguous dynamic_update_slice (28x faster than the row
        # scatter at 65k-env chunks); >= one chunk is guaranteed above
        buffer_local = (buffer_local // (n_local * horizon)) \
            * (n_local * horizon)

    def init(key) -> OffPolicyState:
        # params (k1/k2) draw from the caller's key — under a mesh that key
        # is REPLICATED so replicas start byte-identical (pmean'd grads keep
        # them in lockstep but never reconcile a divergent start); only the
        # env-reset stream (k3) is per-shard
        k1, k2, k3 = jax.random.split(key, 3)
        if axis_name is not None:
            k3 = jax.random.fold_in(k3, jax.lax.axis_index(axis_name))
        dummy_obs = jnp.zeros((1, obs_dim), jnp.float32)
        dummy_act = jnp.zeros((1, act_dim), jnp.float32)
        actor_params = actor.init(k1, dummy_obs)
        q_params = twin_q.init(k2, dummy_obs, dummy_act)
        env_state, ts0 = vecenv.batch_reset(env, env_params, k3, n_local)
        window = dict(
            obs=jnp.zeros((cfg.n_step, n_local, obs_dim), jnp.float32),
            action=jnp.zeros((cfg.n_step, n_local, act_dim), jnp.float32),
            reward=jnp.zeros((cfg.n_step, n_local), jnp.float32),
            next_obs=jnp.zeros((cfg.n_step, n_local, obs_dim), jnp.float32),
            done=jnp.zeros((cfg.n_step, n_local), jnp.bool_))
        return OffPolicyState(
            actor_params=actor_params, q_params=q_params,
            target_q_params=q_params, target_actor_params=actor_params,
            log_alpha=jnp.zeros((), jnp.float32),
            actor_opt=actor_tx.init(actor_params),
            q_opt=q_tx.init(q_params),
            alpha_opt=alpha_tx.init(jnp.zeros((), jnp.float32)),
            rms=RunningMeanStd.create(obs_dim),
            buffer=ReplayBuffer.create(buffer_local, obs_dim, act_dim),
            env_state=env_state, last_obs=ts0.obs,
            step_idx=jnp.zeros((), jnp.int32), window=window)

    def _norm(rms, x):
        return rms.normalize(x) if cfg.normalize_obs else x.astype(jnp.float32)

    def _actor_raw(params, nobs, key):
        mean, log_std = actor.apply(params, nobs)
        if stochastic:
            raw = networks.gaussian_sample(key, mean, log_std)
            logp = networks.gaussian_log_prob(raw, mean, log_std)
            return raw, logp
        return mean, None

    def update(state: OffPolicyState, key: jax.Array):
        akey, skey, rkey, bkey, ukey = jax.random.split(key, 5)

        # ------------------ collect one step from all envs ----------------
        nobs = _norm(state.rms, state.last_obs)
        if stochastic:
            raw, _ = _actor_raw(state.actor_params, nobs, akey)
            a_norm = jnp.tanh(raw)
        else:
            mean, _ = actor.apply(state.actor_params, nobs)
            # SB3-style exploration: noise in normalized action space AFTER
            # the squash (sigma 0.1 == 0.1*range/2 in env units), clipped —
            # stays effective even when tanh saturates
            noise = cfg.explore_noise * jax.random.normal(akey, mean.shape)
            a_norm = jnp.clip(jnp.tanh(mean) + noise, -1.0, 1.0)
        # random warmup until start_steps total env steps (num_envs is the
        # GLOBAL batch — under a mesh all shards step in lockstep): uniform
        # over the action box, like SB3's action_space.sample() phase
        warmup = state.step_idx * cfg.num_envs < cfg.start_steps
        a_norm = jnp.where(
            warmup,
            jax.random.uniform(jax.random.fold_in(akey, 1), a_norm.shape,
                               minval=-1.0, maxval=1.0),
            a_norm)
        env_state, ts = vecenv.batch_step(
            env, env_params, state.env_state, to_env_action(a_norm), skey,
            n_local)
        env_state, next_obs = vecenv.auto_reset(
            env, env_params, env_state, ts, rkey, n_local)
        # fixed-horizon truncations bootstrap (done treated as non-terminal),
        # matching the envs' truncation-only semantics. The newest transition
        # enters an oldest-first rolling window; the window collapses into one
        # n-step transition for its oldest entry (n_step=1: passthrough).
        new = dict(obs=state.last_obs.astype(jnp.float32), action=a_norm,
                   reward=ts.reward, next_obs=ts.obs.astype(jnp.float32),
                   done=ts.done)
        if cfg.n_step == 1:
            window = jax.tree_util.tree_map(lambda x: x[None], new)
        else:
            window = jax.tree_util.tree_map(
                lambda w, x: jnp.concatenate([w[1:], x[None]], 0),
                state.window, new)
        reward_n, next_obs_n, done_n, disc_n = nstep_aggregate(
            window["reward"], window["done"], window["next_obs"], cfg.gamma)
        # contiguous chunk insert whenever the capacity divides evenly (the
        # pointer then stays aligned — byte-identical to the row scatter,
        # but a straight DMA; decisive at TPU-native batches)
        ins = "insert_chunk" if buffer_local % n_local == 0 else "insert"
        if cfg.n_step == 1:
            buffer = getattr(state.buffer, ins)(
                window["obs"][0], window["action"][0],
                reward_n, next_obs_n, done_n, disc_n)
        else:
            # the window starts zero-initialized: its oldest slot only holds a
            # real transition once n_step-1 pushes have happened — inserting
            # before that would plant fabricated (obs=0, action=0) transitions
            # that persist in the buffer for the whole run
            window_full = state.step_idx >= cfg.n_step - 1
            buffer = jax.lax.cond(
                window_full,
                lambda b: getattr(b, ins)(window["obs"][0],
                                          window["action"][0],
                                          reward_n, next_obs_n, done_n,
                                          disc_n),
                lambda b: b, state.buffer)
        rms = state.rms.update(state.last_obs, axis_name) \
            if cfg.normalize_obs else state.rms

        # --------------------------- gradient step ------------------------
        one_update = _make_one_update(buffer, rms)
        carry = (state.actor_params, state.q_params, state.target_q_params,
                 state.target_actor_params, state.log_alpha,
                 state.actor_opt, state.q_opt, state.alpha_opt)
        ukeys = jax.random.split(ukey, cfg.updates_per_iter)
        # uidx drives TD3's delayed policy updates; the XLA path counts
        # ITERATIONS (every update in one iteration shares the phase —
        # the original recipe), the kernel path counts gradient updates
        uidxs = jnp.full((cfg.updates_per_iter,), state.step_idx, jnp.int32)
        carry, _ = jax.lax.scan(one_update, carry, (ukeys, uidxs))
        (actor_params, q_params, tq_params, ta_params, log_alpha,
         actor_opt, q_opt, alpha_opt) = carry

        new_state = OffPolicyState(
            actor_params=actor_params, q_params=q_params,
            target_q_params=tq_params, target_actor_params=ta_params,
            log_alpha=log_alpha, actor_opt=actor_opt, q_opt=q_opt,
            alpha_opt=alpha_opt, rms=rms, buffer=buffer,
            env_state=env_state, last_obs=next_obs,
            step_idx=state.step_idx + 1, window=window)
        mean_step_reward = jnp.mean(ts.reward)
        if axis_name is not None:
            mean_step_reward = jax.lax.pmean(mean_step_reward, axis_name)
        metrics = dict(mean_step_reward=mean_step_reward,
                       alpha=jnp.exp(log_alpha))
        return new_state, metrics

    def _make_one_update(buffer, rms):
        """One critic/actor/alpha gradient step off a buffer sample —
        shared by both collection backends; scanned over (ukey, uidx)
        where ``uidx`` gates TD3's delayed policy updates."""
        def one_update(carry, x):
            ukey, uidx = x
            (actor_params, q_params, tq_params, ta_params, log_alpha,
             actor_opt, q_opt, alpha_opt) = carry
            mb = buffer.sample(ukey, cfg.batch_size)
            nob = _norm(rms, mb["obs"])
            nnext = _norm(rms, mb["next_obs"])
            alpha = jnp.exp(log_alpha)

            # target (critics consume normalized [-1,1] actions)
            if cfg.algo == "sac":
                next_raw, next_logp = _actor_raw(
                    actor_params, nnext, jax.random.fold_in(ukey, 0))
                q1t, q2t = twin_q.apply(tq_params, nnext, jnp.tanh(next_raw))
                qt = jnp.minimum(q1t, q2t) - alpha * next_logp
            else:
                next_mean, _ = actor.apply(ta_params, nnext)
                next_a = jnp.tanh(next_mean)
                if cfg.algo == "td3":
                    # target policy smoothing in normalized space, clipped
                    # back into the action box (SB3/TD3-paper convention)
                    smooth = jnp.clip(
                        cfg.target_noise * jax.random.normal(
                            jax.random.fold_in(ukey, 1), next_a.shape),
                        -cfg.noise_clip, cfg.noise_clip)
                    next_a = jnp.clip(next_a + smooth, -1.0, 1.0)
                q1t, q2t = twin_q.apply(tq_params, nnext, next_a)
                qt = jnp.minimum(q1t, q2t)
            # truncation-only envs: always bootstrap; disc = gamma^k carries
            # the n-step horizon actually covered by this transition
            target = mb["reward"] + mb["disc"] * qt

            def q_loss_fn(qp):
                q1, q2 = twin_q.apply(qp, nob, mb["action"])
                if cfg.algo == "ddpg":
                    return ((q1 - target) ** 2).mean()
                return ((q1 - target) ** 2).mean() + ((q2 - target) ** 2).mean()

            q_grads = jax.grad(q_loss_fn)(q_params)
            if axis_name is not None:
                q_grads = jax.lax.pmean(q_grads, axis_name)
            q_updates, q_opt = q_tx.update(q_grads, q_opt, q_params)
            q_params = optax.apply_updates(q_params, q_updates)

            def actor_loss_fn(ap):
                if cfg.algo == "sac":
                    raw, logp = _actor_raw(ap, nob, jax.random.fold_in(ukey, 2))
                    q1, q2 = twin_q.apply(q_params, nob, jnp.tanh(raw))
                    return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp
                mean, _ = actor.apply(ap, nob)
                q1, _ = twin_q.apply(q_params, nob, jnp.tanh(mean))
                # penalize only the saturating excess (|mean| > 1); inside
                # [-1, 1] the tanh is responsive and the penalty is 0.
                # Scaled by |Q| so the pull-back survives any reward scale
                # (newsvendor Q ~ 1e5, InvManagement Q ~ 1e3).
                sat = jnp.maximum(jnp.abs(mean) - 1.0, 0.0)
                qscale = jax.lax.stop_gradient(jnp.abs(q1).mean()) + 1.0
                reg = cfg.pretanh_penalty * qscale * (sat ** 2).mean()
                return -q1.mean() + reg, jnp.zeros(())

            do_actor = (cfg.algo != "td3") | (uidx % cfg.policy_delay == 0)
            a_grads, logp = jax.grad(actor_loss_fn, has_aux=True)(actor_params)
            if axis_name is not None:
                a_grads = jax.lax.pmean(a_grads, axis_name)
            a_grads = jax.tree_util.tree_map(
                lambda g: jnp.where(do_actor, g, jnp.zeros_like(g)), a_grads)
            a_updates, actor_opt = actor_tx.update(a_grads, actor_opt, actor_params)
            actor_params = optax.apply_updates(actor_params, a_updates)

            if cfg.algo == "sac":
                def alpha_loss_fn(la):
                    return -(jnp.exp(la) * (jax.lax.stop_gradient(logp)
                                            + target_entropy)).mean()
                al_grads = jax.grad(alpha_loss_fn)(log_alpha)
                if axis_name is not None:
                    al_grads = jax.lax.pmean(al_grads, axis_name)
                al_updates, alpha_opt = alpha_tx.update(al_grads, alpha_opt,
                                                        log_alpha)
                log_alpha = optax.apply_updates(log_alpha, al_updates)

            polyak = lambda t, s: jax.tree_util.tree_map(
                lambda a, b: (1 - cfg.tau) * a + cfg.tau * b, t, s)
            tq_params = polyak(tq_params, q_params)
            ta_params = polyak(ta_params, actor_params)
            return (actor_params, q_params, tq_params, ta_params, log_alpha,
                    actor_opt, q_opt, alpha_opt), None

        return one_update

    # ------------------- kernel collection (TPU, episode-chunked)
    def update_kernel(state: OffPolicyState, key: jax.Array,
                      warmup: bool = False):
        """One episode-chunked off-policy iteration off the
        trajectory-emitting Pallas rollouts: a full episode per env
        collected in-kernel (exploration on-core — `traj_policy` modes
        'det'/'sac'/'uniform'), all ``n_local * horizon`` transitions
        inserted oldest-first, then ``horizon * updates_per_iter``
        gradient updates (the XLA path's update:env-step ratio).
        ``warmup`` is STATIC (two compiled variants): the uniform
        action_space.sample() phase."""
        from or_gym_inventory_tpu.ops.pallas_episode_kernels import (
            fold_offpolicy_actor, rollout_traj_im, rollout_traj_nv)
        fam = env.name
        akey, ukey = jax.random.split(key)
        seed = jax.random.randint(akey, (), 0, 2 ** 31 - 1)
        actor_f = fold_offpolicy_actor(
            cfg.pi_arch, state.actor_params,
            state.rms if cfg.normalize_obs else None, stochastic)
        mode = "uniform" if warmup else ("sac" if stochastic else "det")
        # std slot: TD3/DDPG's post-squash noise sigma rides the kernels'
        # clipped-std input (exp(log(sigma)) roundtrip); SAC's std is
        # state-dependent (the folded log_std head) — slot unused
        log_std_arg = jnp.full(
            (act_dim,),
            jnp.log(jnp.float32(max(cfg.explore_noise, 1e-8))), jnp.float32)
        # DEFAULT (bf16-class) matmul precision: unlike the PPO rollout
        # (which pins HIGHEST for logp self-consistency), off-policy
        # recomputes everything from the buffer — no consistency
        # constraint, the exploration policy is statistically identical —
        # and the ~3x smaller Mosaic program keeps SB3-default 256-wide
        # actors inside the relay compile-helper's envelope at multi-tile
        # grids (256x256 @ HIGHEST crashed it at num_envs >= 2048)
        prec = jax.lax.Precision.DEFAULT
        if fam == "inv_management":
            from or_gym_inventory_tpu.envs import inv_management as fam_env
            tr = rollout_traj_im(env_params, actor_f, log_std_arg, seed,
                                 n_local, policy=mode, act_name="relu",
                                 precision=prec)
            obs_all = fam_env.assemble_obs_from_streams(
                env_params, tr["inv"], tr["actions"]).astype(jnp.float32)
        elif fam == "newsvendor":
            from or_gym_inventory_tpu.envs import newsvendor as fam_env
            tr = rollout_traj_nv(env_params, actor_f, log_std_arg, seed,
                                 n_local, policy=mode, act_name="relu",
                                 precision=prec)
            obs_all = fam_env.assemble_obs_from_streams(
                env_params, tr["econ"], tr["orders"]).astype(jnp.float32)
        else:
            from or_gym_inventory_tpu.envs import \
                net_inv_management as fam_env
            from or_gym_inventory_tpu.ops.pallas_net_step import \
                rollout_traj_net
            tr = rollout_traj_net(env_params, actor_f, log_std_arg, seed,
                                  n_local, policy=mode, act_name="relu",
                                  precision=prec)
            obs_all = fam_env.assemble_obs_from_streams(
                env_params, tr["x"], tr["u"], tr["r"]).astype(jnp.float32)
        a_norm = tr["raw"].transpose(0, 2, 1)            # (T, B, act_dim)
        reward = tr["reward"]                            # (T, B)
        T_h = reward.shape[0]

        buffer = state.buffer.insert_chunk(*episode_transitions(
            obs_all, a_norm, reward, cfg.n_step, cfg.gamma))
        rms = state.rms.update(obs_all[:T_h].reshape(-1, obs_all.shape[-1]),
                               axis_name) if cfg.normalize_obs else state.rms

        one_update = _make_one_update(buffer, rms)
        n_upd = T_h * cfg.updates_per_iter
        carry = (state.actor_params, state.q_params, state.target_q_params,
                 state.target_actor_params, state.log_alpha,
                 state.actor_opt, state.q_opt, state.alpha_opt)
        ukeys = jax.random.split(ukey, n_upd)
        # TD3's policy delay counts GRADIENT updates here (truer to the
        # algorithm than the XLA path's per-iteration phase — documented
        # recipe difference of the chunked collection)
        uidxs = state.step_idx * n_upd + jnp.arange(n_upd, dtype=jnp.int32)
        carry, _ = jax.lax.scan(one_update, carry, (ukeys, uidxs))
        (actor_params, q_params, tq_params, ta_params, log_alpha,
         actor_opt, q_opt, alpha_opt) = carry

        new_state = OffPolicyState(
            actor_params=actor_params, q_params=q_params,
            target_q_params=tq_params, target_actor_params=ta_params,
            log_alpha=log_alpha, actor_opt=actor_opt, q_opt=q_opt,
            alpha_opt=alpha_opt, rms=rms, buffer=buffer,
            env_state=state.env_state, last_obs=state.last_obs,
            step_idx=state.step_idx + 1, window=state.window)
        mean_step_reward = jnp.mean(reward)
        if axis_name is not None:
            mean_step_reward = jax.lax.pmean(mean_step_reward, axis_name)
        metrics = dict(mean_step_reward=mean_step_reward,
                       alpha=jnp.exp(log_alpha))
        return new_state, metrics

    def eval_policy(policy_state, obs, key, _t):
        params, rms = policy_state
        nobs = _norm(rms, obs)
        mean, _ = actor.apply(params, nobs)
        return to_env_action(jnp.tanh(mean))

    return init, (update_kernel if cfg.collect == "kernel" else update), \
        eval_policy


def train(env: Environment, env_params, cfg: OffPolicyConfig, key: jax.Array,
          total_timesteps: int, log_every: int = 500, progress=None,
          mesh=None, axis_name: str = "env"):
    """Run off-policy training; chunked so each device call covers many
    iterations (scan) with metrics surfaced every ``log_every`` iters.

    ``log_every`` is clamped to the iteration budget and the final chunk is
    ragged, so training runs EXACTLY ``total_timesteps // steps_per_iter``
    iterations, where an iteration covers ``num_envs`` env steps
    (collect="xla") or ``num_envs * horizon`` (collect="kernel",
    episode-chunked). The scan length is carried by the key array's
    leading dim, so at most two program shapes compile per phase (full
    chunk + ragged tail; the kernel path's uniform-action warmup is its
    own phase).

    With ``mesh``, the env batch + replay buffer shard over ``axis_name``
    (data parallel over ICI); params replicate and gradients pmean — the
    same layout as agents/ppo.train.
    """
    from jax.sharding import PartitionSpec as P

    kernel_mode = cfg.collect == "kernel"
    if mesh is None:
        init, update, eval_policy = make_offpolicy(env, env_params, cfg)
        init_jit = jax.jit(init)

        def make_runner(upd):
            def chunk(state, keys):
                def body(carry, k):
                    state = carry
                    state, metrics = upd(state, k)
                    return state, metrics
                state, metrics = jax.lax.scan(body, state, keys)
                return state, jax.tree_util.tree_map(jnp.mean, metrics)
            return jax.jit(chunk)

        run_chunk = make_runner(update)
        run_chunk_warm = make_runner(
            lambda s, k: update(s, k, warmup=True)) if kernel_mode else None

        def chunk_keys(ckey, n):
            return jax.random.split(ckey, n)

        state = init_jit(key)
    else:
        n_dev = mesh.devices.size
        assert cfg.num_envs % n_dev == 0, (cfg.num_envs, n_dev)
        assert cfg.buffer_size % n_dev == 0, (cfg.buffer_size, n_dev)
        local = cfg.num_envs // n_dev
        init, update, eval_policy = make_offpolicy(
            env, env_params, cfg, axis_name=axis_name, local_envs=local)

        state_spec = OffPolicyState(
            actor_params=P(), q_params=P(), target_q_params=P(),
            target_actor_params=P(), log_alpha=P(), actor_opt=P(), q_opt=P(),
            alpha_opt=P(), rms=P(),
            buffer=ReplayBuffer(obs=P(axis_name), action=P(axis_name),
                                reward=P(axis_name), next_obs=P(axis_name),
                                done=P(axis_name), disc=P(axis_name),
                                ptr=P(), filled=P()),
            env_state=P(axis_name), last_obs=P(axis_name), step_idx=P(),
            window=P(None, axis_name))

        # init key REPLICATED: params identical per shard, env streams forked
        # inside init via axis_index
        init_fn = jax.shard_map(init, mesh=mesh, in_specs=P(),
                                out_specs=state_spec, check_vma=False)
        state = jax.jit(init_fn)(key)

        def make_runner(upd):
            def sharded_chunk(state, keys):
                # keys block is (n, 1[, 2]): this shard's per-iteration
                # stream
                ks = keys[:, 0]

                def body(carry, k):
                    state = carry
                    state, metrics = upd(state, k)
                    return state, metrics

                state, metrics = jax.lax.scan(body, state, ks)
                return state, jax.tree_util.tree_map(jnp.mean, metrics)

            return jax.jit(jax.shard_map(
                sharded_chunk, mesh=mesh,
                in_specs=(state_spec, P(None, axis_name)),
                out_specs=(state_spec, P()), check_vma=False))

        run_chunk = make_runner(update)
        run_chunk_warm = make_runner(
            lambda s, k: update(s, k, warmup=True)) if kernel_mode else None

        def chunk_keys(ckey, n):
            n_dev = mesh.devices.size
            ks = jax.random.split(ckey, n * n_dev)
            # old-style keys carry a trailing (2,) uint32 dim; keep it
            return ks.reshape(n, n_dev, *ks.shape[1:])

    # kernel collection is episode-chunked: each iteration covers a whole
    # horizon per env, and the uniform-action warmup phase (start_steps)
    # runs as separate statically-compiled iterations up front
    steps_per_iter = cfg.num_envs * (env.horizon(env_params)
                                     if kernel_mode else 1)
    n_iters = max(1, total_timesteps // steps_per_iter)
    warm_iters = min(n_iters, -(-cfg.start_steps // steps_per_iter)) \
        if kernel_mode and cfg.start_steps > 0 else 0
    log_every = max(1, min(log_every, n_iters))
    metrics_log = []
    done_iters = 0
    while done_iters < n_iters:
        n = min(log_every, n_iters - done_iters)
        if done_iters < warm_iters:
            n = min(n, warm_iters - done_iters)
            runner = run_chunk_warm
        else:
            runner = run_chunk
        key, ckey = jax.random.split(key)
        state, metrics = runner(state, chunk_keys(ckey, n))
        done_iters += n
        m = {k: float(v) for k, v in metrics.items()}
        m["timesteps"] = done_iters * steps_per_iter
        metrics_log.append(m)
        if progress:
            progress(m, state)
    stacked = {k: np.array([m[k] for m in metrics_log])
               for k in metrics_log[0]} if metrics_log else {}
    return state, eval_policy, stacked


# ======================================================== host agent wrapper

class OffPolicyAgent(BaseAgent):
    """BaseAgent-protocol wrapper for SAC/TD3/DDPG (mirrors SB3AgentWrapper
    ergonomics: checkpoint shortcut, save/load, training CSV)."""

    def __init__(self, env: Environment, params_factory, algo: str = "sac",
                 name: Optional[str] = None,
                 config: Optional[OffPolicyConfig] = None,
                 model_dir: str = "./models", log_dir: str = "./logs",
                 force_retrain: bool = False, seed: int = 0,
                 eval_every_chunks: int = 0, eval_episodes: int = 64,
                 mesh=None):
        super().__init__(name=name or algo.upper())
        self.env = env
        self.params_factory = params_factory
        self.config = (config or OffPolicyConfig()).replace(algo=algo)
        self.model_dir, self.log_dir = model_dir, log_dir
        self.force_retrain = force_retrain
        self.seed = seed
        self.mesh = mesh
        # EvalCallback equivalent (reference SB3AgentWrapper keeps the best
        # periodic-eval checkpoint; benchmark_InvManagementBacklogEnv.py:
        # 275-281, 303-311). 0 = disabled.
        self.eval_every_chunks = eval_every_chunks
        self.eval_episodes = eval_episodes
        self.env_params = None
        self.state = None
        self._eval_policy = None
        self.training_log = None

    def _ckpt_path(self, prefix=""):
        return os.path.join(self.model_dir, f"{prefix}{self.name}.msgpack")

    def save(self, path=None):
        path = path or self._ckpt_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        payload = {"actor": self.state.actor_params,
                   "rms": dict(mean=self.state.rms.mean, var=self.state.rms.var,
                               count=self.state.rms.count)}
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))
        write_ckpt_meta(path, getattr(self, "trained_timesteps", 0))
        return path

    def load(self, path: str):
        if self.env_params is None:
            self.env_params = self.params_factory()
        # eval/init don't depend on the collection backend; collect="xla"
        # keeps kernel-trained checkpoints loadable off-TPU
        init, _, eval_policy = make_offpolicy(
            self.env, self.env_params, self.config.replace(collect="xla"))
        tmpl = jax.jit(init)(jax.random.PRNGKey(self.seed))
        payload = {"actor": tmpl.actor_params,
                   "rms": dict(mean=tmpl.rms.mean, var=tmpl.rms.var,
                               count=tmpl.rms.count)}
        with open(path, "rb") as f:
            restored = serialization.from_bytes(payload, f.read())
        self.state = tmpl.replace(
            actor_params=restored["actor"],
            rms=RunningMeanStd(**restored["rms"]))
        self.trained_timesteps = ckpt_trained_timesteps(path)
        self._eval_policy = jax.jit(eval_policy)
        self._eval_ps = None

    def train(self, env_config: dict, total_timesteps: int,
              save_path_prefix: str = ""):
        self.env_params = self.params_factory(env_config=env_config or None)
        ckpt = self._ckpt_path(save_path_prefix)
        if not self.force_retrain and os.path.exists(ckpt):
            trained = ckpt_trained_timesteps(ckpt)
            if trained >= total_timesteps:
                print(f"Loading existing model for {self.name} from {ckpt} "
                      f"(trained {trained} >= {total_timesteps})")
                self.load(ckpt)
                self.training_time = 0.0
                return
            print(f"Checkpoint {ckpt} trained only {trained} < "
                  f"{total_timesteps} steps; retraining")
        print(f"Training {self.name} ({self.config.algo}) for "
              f"{total_timesteps} steps...")
        start = time.time()
        best = {"reward": -np.inf, "actor": None, "rms": None}
        progress = None
        if self.eval_every_chunks > 0:
            _, _, eval_pol = make_offpolicy(
                self.env, self.env_params, self.config.replace(collect="xla"))
            chunk_counter = {"n": 0}

            def progress(m, st):
                chunk_counter["n"] += 1
                if chunk_counter["n"] % self.eval_every_chunks:
                    return
                totals, _ = vecenv.evaluate_episodes(
                    self.env, self.env_params, eval_pol,
                    (st.actor_params, st.rms),
                    jax.random.PRNGKey(self.seed + 1), self.eval_episodes)
                mean = float(np.mean(np.asarray(totals)))
                if mean > best["reward"]:
                    best.update(reward=mean, actor=st.actor_params, rms=st.rms)

        state, eval_policy, metrics = train(
            self.env, self.env_params, self.config,
            jax.random.PRNGKey(self.seed), total_timesteps,
            progress=progress, mesh=self.mesh)
        if best["actor"] is not None:
            print(f"Loading best model (eval reward {best['reward']:.2f})")
            state = state.replace(actor_params=best["actor"], rms=best["rms"])
        self.state = state
        self._eval_policy = jax.jit(eval_policy)
        self._eval_ps = None
        self.training_log = metrics
        self.training_time = time.time() - start
        self.trained_timesteps = total_timesteps
        self.save(ckpt)
        if metrics:
            import csv
            os.makedirs(self.log_dir, exist_ok=True)
            with open(os.path.join(self.log_dir,
                                   f"{self.name}_train_log.csv"), "w",
                      newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(metrics.keys()))
                w.writeheader()
                for i in range(len(next(iter(metrics.values())))):
                    w.writerow({k: metrics[k][i] for k in metrics})
        print(f"Training for {self.name} finished in {self.training_time:.2f}s "
              f"({total_timesteps / max(self.training_time, 1e-9):,.0f} "
              f"trained-steps/s)")

    def _ensure_eval_ps(self):
        """CPU-pinned copy of (actor_params, rms) for latency-bound host eval
        (see PPOAgent._ensure_policy)."""
        if getattr(self, "_eval_ps", None) is None:
            ps = (self.state.actor_params, self.state.rms)
            key = jax.random.PRNGKey(0)
            try:
                cpu = jax.local_devices(backend="cpu")[0]
                ps = jax.device_put(ps, cpu)
                key = jax.device_put(key, cpu)
            except RuntimeError:
                pass
            self._eval_ps, self._eval_key = ps, key
        return self._eval_ps

    def get_action(self, observation, env):
        if self.state is None:
            return env.action_space.sample().astype(env.action_space.dtype)
        ps = self._ensure_eval_ps()
        obs = np.asarray(observation, np.float32)[None]
        a = self._eval_policy(ps, obs, self._eval_key, np.zeros((), np.int32))
        return np.asarray(a[0]).astype(env.action_space.dtype)

    def device_policy(self, env, params):
        _, _, eval_policy = make_offpolicy(
            self.env, self.env_params or params,
            self.config.replace(collect="xla"))
        ps = (self.state.actor_params, self.state.rms)
        return lambda _s, obs, key, t: eval_policy(ps, obs, key, t)


class SACAgent(OffPolicyAgent):
    def __init__(self, env, params_factory, name="SAC", **kw):
        super().__init__(env, params_factory, algo="sac", name=name, **kw)


class TD3Agent(OffPolicyAgent):
    def __init__(self, env, params_factory, name="TD3", **kw):
        super().__init__(env, params_factory, algo="td3", name=name, **kw)


class DDPGAgent(OffPolicyAgent):
    def __init__(self, env, params_factory, name="DDPG", **kw):
        super().__init__(env, params_factory, algo="ddpg", name=name, **kw)
