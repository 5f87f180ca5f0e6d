"""On-device PPO actor-learner.

Replaces the reference's SB3/RLlib training paths (SB3AgentWrapper,
benchmark_InvManagementBacklogEnv.py:201-342; RLlibAgentWrapper,
benchmark_NetInvMgmtLostSalesEnv_sb3_rllib.py:264-361) with a single jitted
program per update: rollout (policy inference + env step fused in one
``lax.scan``) -> GAE -> minibatched clipped-surrogate SGD. No actor/learner
process split, no replay over sockets — the env batch lives on device and
the learner consumes it in place.

Scaling: ``mesh`` shards the env batch over devices (data parallel); the
ONLY cross-device communication is gradient/statistic ``psum`` inside the
update — compiled XLA collectives over ICI.

Host-side ``PPOAgent`` speaks the reference BaseAgent protocol (train /
load / get_action / get_training_time) including checkpoint shortcutting
(skip retrain when a checkpoint matches, reference :243-250) and per-update
training logs for learning-curve plots.
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
from jax.sharding import Mesh, PartitionSpec as P

from or_gym_inventory_tpu.agents import networks
from or_gym_inventory_tpu.agents.base import (BaseAgent,
                                              ckpt_trained_timesteps,
                                              write_ckpt_meta)
from or_gym_inventory_tpu.envs.base import Environment
from or_gym_inventory_tpu.vector import vecenv


# The measured crossover for the minibatch recipe (PERFORMANCE.md round-4
# scaling table): below this env count the per-epoch permutation gather is
# cheap and the classic recipe is kept; at/above it env-sliced minibatches
# are 3.8x faster with validated reward parity (tools/validate_noshuffle.py).
NOSHUFFLE_ENVS_THRESHOLD = 16384


@struct.dataclass
class PPOConfig:
    num_envs: int = struct.field(pytree_node=False, default=1024)
    rollout_steps: int = struct.field(pytree_node=False, default=64)
    lr: float = struct.field(pytree_node=False, default=3e-4)
    gamma: float = struct.field(pytree_node=False, default=0.99)
    gae_lambda: float = struct.field(pytree_node=False, default=0.95)
    clip_eps: float = struct.field(pytree_node=False, default=0.2)
    update_epochs: int = struct.field(pytree_node=False, default=4)
    num_minibatches: int = struct.field(pytree_node=False, default=8)
    ent_coef: float = struct.field(pytree_node=False, default=0.0)
    vf_coef: float = struct.field(pytree_node=False, default=0.5)
    max_grad_norm: float = struct.field(pytree_node=False, default=0.5)
    pi_arch: Tuple[int, ...] = struct.field(pytree_node=False, default=(64, 64))
    vf_arch: Tuple[int, ...] = struct.field(pytree_node=False, default=(64, 64))
    activation: str = struct.field(pytree_node=False, default="tanh")
    anneal_lr: bool = struct.field(pytree_node=False, default=True)
    normalize_obs: bool = struct.field(pytree_node=False, default=True)
    # inventory-env rewards span 1e2..1e6 across configs; scaling by the
    # running std of discounted returns (VecNormalize-style) is the right
    # default here
    normalize_reward: bool = struct.field(pytree_node=False, default=True)
    optimizer: str = struct.field(pytree_node=False, default="adam")
    # True reproduces the classic PPO recipe: a fresh random permutation of
    # the flat (T*B) batch every epoch. At TPU-native batch sizes the
    # per-epoch permutation gather is pure HBM traffic (at 262k envs x 32
    # steps the flat batch is ~GBs; 4 epochs of gather+write+read dominate
    # the update). False slices minibatches by ENV instead — each minibatch
    # is every timestep of a contiguous env slice, built once per update
    # with a single transpose and re-read by every epoch. Envs are i.i.d.,
    # so env-sliced minibatches are unbiased; with >=1e5-sample minibatches
    # the shuffle's variance contribution is negligible anyway.
    # None (the default) resolves automatically: the classic shuffled
    # recipe below NOSHUFFLE_ENVS_THRESHOLD envs, env-sliced above it —
    # where the measured 3.8x throughput win holds and reward parity was
    # validated at the IM-backlog protocol (tools/validate_noshuffle.py,
    # RESULTS.md). See resolved_shuffle().
    shuffle_minibatches: Optional[bool] = struct.field(pytree_node=False,
                                                       default=None)
    # Experience-generation backend. "xla": the fused policy+env lax.scan
    # rollout (works everywhere; measured ceiling ~10-20M env-steps/s,
    # PERFORMANCE.md). "kernel": the trajectory-emitting Pallas rollout —
    # one full stochastic-policy episode per lane per update with the MLP
    # actor fused in-kernel and the training streams written to HBM
    # (ops/pallas_episode_kernels.rollout_traj_im / rollout_traj_nv,
    # ops/pallas_net_step.rollout_traj_net). TPU-only; requires
    # rollout_steps == the env horizon (episode-aligned updates) and
    # num_envs a multiple of 1024. The learned-policy analogue of the
    # evaluation engine's fused kernels: experience generation stops
    # being the learner's bottleneck (PERFORMANCE.md round 5).
    rollout: str = struct.field(pytree_node=False, default="xla")
    # Activation dtype for the kernel-rollout update's forward/backward
    # passes ("bfloat16"; None = float32). Parameters, gradients,
    # logp/adv/ret and the optimizer stay f32. Kernel-rollout path only
    # (the XLA path computes logp_old in-rollout at f32 — mixing
    # precisions would skew the epoch-0 ratio). Measured neutral at the
    # default net sizes (the SGD phase is working-set bound, not
    # compute bound — see minibatch_chunks); kept for wide nets.
    compute_dtype: Optional[str] = struct.field(pytree_node=False,
                                                default=None)
    # Gradient accumulation within each minibatch: the minibatch gradient
    # is computed as the exact mean of `minibatch_chunks` sequential
    # sub-chunk gradients (advantage normalization uses the full
    # minibatch's statistics, so the update is bit-equivalent to the
    # unchunked recipe up to f32 summation order). At TPU-native batches
    # a minibatch's forward/backward activations spill to HBM
    # (~250k-sample minibatches measured ~2.3x slower per sample than
    # ~60k); chunking keeps the working set on-chip WITHOUT changing the
    # recipe. 0 (default) auto-picks the largest chunk under
    # ~32k samples (the measured sweet spot); 1 disables.
    minibatch_chunks: int = struct.field(pytree_node=False, default=0)
    # Runs that many updates per device call (lax.scan over the update),
    # amortizing the per-call dispatch floor — decisive for SB3-shaped
    # configs (tiny batch, tens of thousands of updates) and for this
    # container's ~30 ms TPU relay. Metrics still come back per update;
    # progress/eval callbacks fire at chunk boundaries (PPOAgent.train
    # re-aligns the chunk so the eval cadence is honored exactly).
    # Chunked is the default: per-update dispatch costs ~10x wall-clock
    # at benchmark budgets (RESULTS.md round-2 tables).
    updates_per_call: int = struct.field(pytree_node=False, default=16)

    def num_updates(self, total_timesteps: int) -> int:
        return max(1, total_timesteps // (self.num_envs * self.rollout_steps))

    def resolved_shuffle(self, n_envs: int) -> bool:
        """The effective minibatch recipe for a batch of ``n_envs``.
        ``shuffle_minibatches=None`` (auto) picks the classic shuffled
        recipe below ``NOSHUFFLE_ENVS_THRESHOLD`` envs and env-sliced
        minibatches at TPU-native batch (also shuffled when the env count
        doesn't divide into minibatches — env slicing needs it)."""
        if self.shuffle_minibatches is None:
            return (n_envs < NOSHUFFLE_ENVS_THRESHOLD
                    or n_envs % self.num_minibatches != 0)
        return self.shuffle_minibatches


@struct.dataclass
class RunningMeanStd:
    mean: jax.Array
    var: jax.Array
    count: jax.Array

    @classmethod
    def create(cls, dim: int):
        return cls(mean=jnp.zeros((dim,), jnp.float32),
                   var=jnp.ones((dim,), jnp.float32),
                   count=jnp.asarray(1e-4, jnp.float32))

    def update(self, batch: jax.Array, axis_name: Optional[str] = None):
        """Welford batch update; with ``axis_name`` the statistics are
        psum-combined so replicas stay identical."""
        x = batch.reshape(-1, batch.shape[-1]).astype(jnp.float32)
        n = jnp.asarray(x.shape[0], jnp.float32)
        s = jnp.sum(x, axis=0)
        ss = jnp.sum(x * x, axis=0)
        if axis_name is not None:
            n = jax.lax.psum(n, axis_name)
            s = jax.lax.psum(s, axis_name)
            ss = jax.lax.psum(ss, axis_name)
        b_mean = s / n
        b_var = jnp.maximum(ss / n - b_mean ** 2, 0.0)
        delta = b_mean - self.mean
        tot = self.count + n
        new_mean = self.mean + delta * n / tot
        m_a = self.var * self.count
        m_b = b_var * n
        new_var = (m_a + m_b + delta ** 2 * self.count * n / tot) / tot
        return RunningMeanStd(mean=new_mean, var=new_var, count=tot)

    def normalize(self, x: jax.Array) -> jax.Array:
        return (x.astype(jnp.float32) - self.mean) / jnp.sqrt(self.var + 1e-8)


@struct.dataclass
class PPOTrainState:
    params: dict
    opt_state: optax.OptState
    rms: RunningMeanStd
    ret_rms: RunningMeanStd   # running std of discounted returns (reward norm)
    ret_accum: jax.Array      # (num_envs,) discounted return accumulator
    env_state: object
    last_obs: jax.Array
    update_idx: jax.Array


def _make_model(env: Environment, env_params, cfg: PPOConfig):
    space = env.action_space(env_params)
    return networks.MLPActorCritic(
        action_dim=int(np.prod(space.shape)), pi_arch=cfg.pi_arch,
        vf_arch=cfg.vf_arch, activation=cfg.activation)


def apply_actor_critic(params, obs_f, cfg: PPOConfig, dtype=None):
    """MLPActorCritic.apply as raw-array math over the same param tree —
    byte-identical layers/naming (pi trunk Dense_0.., mean Dense_{n_pi},
    vf trunk after log_std, value head last; agents/networks.py), with
    optional low-precision activations: ``dtype='bfloat16'`` casts matmul
    inputs and accumulates f32 (preferred_element_type), leaving params,
    biases and outputs f32. Returns (mean, log_std, value).

    Precision contract for the kernel-rollout path: logp_old and logp_new
    are BOTH computed through this function (same precision), so the
    epoch-0 PPO ratio is exactly 1 by construction. The in-kernel
    SAMPLING mean (HIGHEST-precision MXU matmuls) can differ from this
    function's backend-default mean by ~1e-3 relative — a bounded,
    fixed-scale off-policy-ness the PPO clip absorbs (reward parity
    across seeds: tools/validate_kernel_ppo.py)."""
    p = params["params"]
    n_pi, n_vf = len(cfg.pi_arch), len(cfg.vf_arch)
    act = {"tanh": jnp.tanh, "relu": jax.nn.relu,
           "gelu": jax.nn.gelu}[cfg.activation]
    cast = (lambda x: x.astype(dtype)) if dtype else (lambda x: x)

    def dense(x, i):
        d = p[f"Dense_{i}"]
        return jnp.dot(cast(x), cast(d["kernel"]),
                       preferred_element_type=jnp.float32) + d["bias"]

    h = obs_f
    for i in range(n_pi):
        h = act(dense(h, i))
    mean = dense(h, n_pi)
    g = obs_f
    for j in range(n_vf):
        g = act(dense(g, n_pi + 1 + j))
    value = dense(g, n_pi + 1 + n_vf)[..., 0]
    return mean, p["log_std"], value


def _optimizer(cfg: PPOConfig, total_updates: int):
    if cfg.anneal_lr:
        lr = optax.linear_schedule(
            cfg.lr, 0.0,
            max(1, total_updates * cfg.update_epochs * cfg.num_minibatches))
    else:
        lr = cfg.lr
    if cfg.optimizer == "rmsprop":  # SB3's A2C default
        opt = optax.rmsprop(lr, decay=0.99, eps=1e-5)
    else:
        opt = optax.adam(lr, eps=1e-5)
    return optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), opt)


def init_train_state(env: Environment, env_params, cfg: PPOConfig,
                     key: jax.Array, total_updates: int,
                     local_envs: Optional[int] = None,
                     axis_name: Optional[str] = None) -> PPOTrainState:
    """With ``axis_name`` (inside shard_map with a REPLICATED key), params
    initialize from the common key — replicas must be byte-identical, since
    pmean'd gradients keep them in lockstep but never reconcile a divergent
    start — while the env-reset key is per-shard (folded axis index)."""
    model = _make_model(env, env_params, cfg)
    obs_dim = env.observation_space(env_params).shape[0]
    n = local_envs or cfg.num_envs
    p_key, r_key = jax.random.split(key)
    if axis_name is not None:
        r_key = jax.random.fold_in(r_key, jax.lax.axis_index(axis_name))
    params = model.init(p_key, jnp.zeros((1, obs_dim), jnp.float32))
    opt_state = _optimizer(cfg, total_updates).init(params)
    env_state, ts0 = vecenv.batch_reset(env, env_params, r_key, n)
    return PPOTrainState(
        params=params, opt_state=opt_state,
        rms=RunningMeanStd.create(obs_dim),
        ret_rms=RunningMeanStd.create(1),
        ret_accum=jnp.zeros((n,), jnp.float32),
        env_state=env_state,
        last_obs=ts0.obs, update_idx=jnp.zeros((), jnp.int32))


def make_update_fn(env: Environment, env_params, cfg: PPOConfig,
                   total_updates: int, axis_name: Optional[str] = None):
    """Build one fully-jitted PPO update: rollout + GAE + epochs of
    minibatch SGD. With ``axis_name`` set (inside shard_map) gradients and
    normalization statistics psum over the mesh."""
    model = _make_model(env, env_params, cfg)
    space = env.action_space(env_params)
    low = jnp.asarray(space.low, jnp.float32)
    high = jnp.asarray(np.where(np.isinf(space.high), 1e4, space.high), jnp.float32)
    int_actions = np.issubdtype(space.dtype, np.integer)
    tx = _optimizer(cfg, total_updates)

    def to_env_action(raw):
        a = networks.squash_action(raw, low, high)
        return a.astype(jnp.int32) if int_actions else a

    if cfg.rollout not in ("xla", "kernel"):
        raise ValueError(f"rollout must be 'xla' or 'kernel', got "
                         f"{cfg.rollout!r}")
    if cfg.rollout == "kernel":
        fam = getattr(env, "name", None)
        if fam not in ("inv_management", "newsvendor",
                       "net_inv_management"):
            raise NotImplementedError(
                "rollout='kernel' supports the InvManagement, Newsvendor "
                f"and NetInvMgmt families (got {fam!r})")
        horizon = env.horizon(env_params)
        if cfg.rollout_steps != horizon:
            raise ValueError(
                "rollout='kernel' runs episode-aligned updates: "
                f"rollout_steps ({cfg.rollout_steps}) must equal the env "
                f"horizon ({horizon})")
        if cfg.num_envs % 1024:
            raise ValueError(
                "rollout='kernel' needs num_envs to be a multiple of 1024 "
                f"(the kernel block size); got {cfg.num_envs}. Under a "
                "mesh the PER-SHARD env count (num_envs / devices) must "
                "be a multiple of 1024.")
        if jax.default_backend() != "tpu":
            raise RuntimeError(
                "rollout='kernel' needs the TPU backend (Pallas episode "
                "kernels); use rollout='xla' elsewhere")
    elif cfg.compute_dtype is not None:
        raise ValueError(
            "compute_dtype is a kernel-rollout option (the XLA path "
            "computes logp_old in-rollout at f32; mixing precisions "
            "would skew the epoch-0 ratio)")

    # ------------------------------------------------- shared GAE phase
    def gae_advantages(reward, done, values, next_values):
        """delta bootstraps through ``next_values`` (V(final_obs) at
        truncation boundaries — SB3's truncation handling); ``done`` stops
        advantage propagation across episode boundaries."""
        def gae_step(next_adv, inp):
            reward, done, value, next_value = inp
            nd = 1.0 - done.astype(jnp.float32)
            delta = reward + cfg.gamma * next_value - value
            adv = delta + cfg.gamma * cfg.gae_lambda * nd * next_adv
            return adv, adv

        _, advs = jax.lax.scan(
            gae_step, jnp.zeros_like(values[0]),
            (reward, done, values, next_values), reverse=True)
        return advs

    # ------------------------------------------------- shared SGD phase
    def sgd_phase(state, batch, n_envs, key, forward=None,
                  pre_normalized=False):
        """Epochs of minibatched clipped-surrogate SGD over a time-major
        batch dict (T, n_envs, ...) with keys obs/raw/logp/value/adv/ret.
        ``forward`` overrides the model forward (the kernel path's
        raw-array/low-precision apply); ``pre_normalized`` marks the
        batch's obs as already normalized (stored once per update instead
        of re-normalized per minibatch per epoch).
        Returns (params, opt_state, aux, flat)."""
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), batch)
        T_steps = batch["obs"].shape[0]
        batch_size = T_steps * n_envs
        mb_size = batch_size // cfg.num_minibatches
        fwd = forward if forward is not None else \
            (lambda p, o: model.apply(p, o))

        def loss_fn(params, mb, adv_stats=None):
            if pre_normalized:
                norm_obs = mb["obs"]
            else:
                norm_obs = state.rms.normalize(mb["obs"]) \
                    if cfg.normalize_obs else mb["obs"].astype(jnp.float32)
            mean, log_std, value = fwd(params, norm_obs)
            logp = networks.gaussian_log_prob(mb["raw"], mean, log_std)
            ratio = jnp.exp(logp - mb["logp"])
            # advantage normalization uses the FULL minibatch's statistics
            # (passed in when the gradient is chunk-accumulated)
            a_mean, a_std = adv_stats if adv_stats is not None else (
                mb["adv"].mean(), mb["adv"].std())
            adv = (mb["adv"] - a_mean) / (a_std + 1e-8)
            pg1 = ratio * adv
            pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv
            pg_loss = -jnp.minimum(pg1, pg2).mean()
            v_clip = mb["value"] + jnp.clip(value - mb["value"],
                                            -cfg.clip_eps, cfg.clip_eps)
            v_loss = 0.5 * jnp.maximum((value - mb["ret"]) ** 2,
                                       (v_clip - mb["ret"]) ** 2).mean()
            ent = networks.entropy_bonus(log_std).mean()
            total = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent
            return total, (pg_loss, v_loss, ent)

        def chunk_count(mb_samples: int) -> int:
            if cfg.minibatch_chunks > 0:
                k0 = cfg.minibatch_chunks
            else:
                # auto: largest chunk at/below the measured on-chip sweet
                # spot (~32k samples; larger minibatches spill the fwd/bwd
                # activations to HBM — PERFORMANCE.md round 5)
                k0 = -(-mb_samples // 32768)
            # bounded divisor search: an awkward mb_samples (e.g. a large
            # prime factor) must degrade to UNCHUNKED, never to a
            # near-per-sample scan
            k = k0
            while k <= 2 * k0 and mb_samples % k:
                k += 1
            if k > 2 * k0 or mb_samples % k:
                return 1
            return min(k, mb_samples)

        def minibatch_grads(params, mb):
            """Exact minibatch gradient, computed whole or as the mean of
            equal-size sequential chunk gradients (identical up to f32
            summation order — chunk losses are means over equal chunks)."""
            n = mb["adv"].shape[0]
            k = chunk_count(n)
            if k <= 1:
                return jax.grad(loss_fn, has_aux=True)(params, mb)
            stats = (mb["adv"].mean(), mb["adv"].std())
            chunks = jax.tree_util.tree_map(
                lambda x: x.reshape((k, n // k) + x.shape[1:]), mb)

            def acc(g_sum, ch):
                g, aux = jax.grad(loss_fn, has_aux=True)(params, ch, stats)
                return jax.tree_util.tree_map(jnp.add, g_sum, g), aux

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            g_sum, auxs = jax.lax.scan(acc, zeros, chunks)
            grads = jax.tree_util.tree_map(lambda g: g / k, g_sum)
            aux = jax.tree_util.tree_map(jnp.mean, auxs)
            return grads, aux

        def minibatch(carry, mb):
            params, opt_state = carry
            grads, aux = minibatch_grads(params, mb)
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), aux

        # num_minibatches == 1: the "minibatch" is the whole batch and the
        # mean gradient is permutation-invariant — the shuffle buys nothing
        # but a full-batch HBM gather (measured ~1.5x the A2C update at 65k+
        # envs), so it is always skipped.
        shuffle = cfg.resolved_shuffle(n_envs)
        if cfg.num_minibatches > 1 and cfg.shuffle_minibatches is False \
                and n_envs % cfg.num_minibatches:
            # an EXPLICIT False with a non-divisible env count silently
            # keeps the shuffled path; say so rather than silently charging
            # the shuffle's HBM cost (auto mode resolves this itself)
            import warnings
            warnings.warn(
                f"shuffle_minibatches=False needs num_envs ({n_envs}) "
                f"divisible by num_minibatches ({cfg.num_minibatches}); "
                "using the shuffled path", RuntimeWarning)
        if cfg.num_minibatches > 1 and (
                shuffle or n_envs % cfg.num_minibatches):
            def epoch(carry, ekey):
                params, opt_state = carry
                perm = jax.random.permutation(ekey, batch_size)
                shuffled = jax.tree_util.tree_map(lambda x: x[perm], flat)
                mbs = jax.tree_util.tree_map(
                    lambda x: x[: mb_size * cfg.num_minibatches].reshape(
                        (cfg.num_minibatches, mb_size) + x.shape[1:]),
                    shuffled)
                (params, opt_state), aux = jax.lax.scan(
                    minibatch, (params, opt_state), mbs)
                return (params, opt_state), aux
        else:
            # env-sliced minibatches, built ONCE per update (epoch-invariant
            # — no per-epoch permutation gather; see shuffle_minibatches)
            w = n_envs // cfg.num_minibatches
            mbs_fixed = jax.tree_util.tree_map(
                lambda x: x.reshape(
                    (T_steps, cfg.num_minibatches, w)
                    + x.shape[2:]).swapaxes(0, 1).reshape(
                    (cfg.num_minibatches, T_steps * w)
                    + x.shape[2:]), batch)

            def epoch(carry, _ekey):
                (params, opt_state) = carry
                (params, opt_state), aux = jax.lax.scan(
                    minibatch, (params, opt_state), mbs_fixed)
                return (params, opt_state), aux

        epoch_keys = jax.random.split(key, cfg.update_epochs)
        (params, opt_state), aux = jax.lax.scan(
            epoch, (state.params, state.opt_state), epoch_keys)
        return params, opt_state, aux, flat

    # ------------------------- kernel-rollout update (TPU, IM family)
    def update_kernel(state: PPOTrainState, key: jax.Array):
        """One episode-aligned PPO update off the trajectory-emitting
        Pallas rollout: the stochastic MLP actor runs IN-KERNEL (obs
        normalization folded into the first layer, exploration noise from
        the hardware PRNG), the dumped streams reconstruct the obs batch
        with zero per-step round-trips, and logp/values are recomputed in
        one batched forward (self-consistent across epochs)."""
        from or_gym_inventory_tpu.ops.pallas_episode_kernels import (
            fold_actor_params, rollout_traj_im, rollout_traj_nv)
        n_envs = state.last_obs.shape[0]
        T = cfg.rollout_steps

        seed_key, key = jax.random.split(key)
        seed = jax.random.randint(seed_key, (), 0, 2 ** 31 - 1)
        actor = fold_actor_params(
            cfg, state.params, state.rms if cfg.normalize_obs else None)
        log_std = state.params["params"]["log_std"]
        if env.name == "inv_management":
            from or_gym_inventory_tpu.envs import inv_management as fam_env
            tr = rollout_traj_im(env_params, actor, log_std, seed, n_envs)
            obs_all = fam_env.assemble_obs_from_streams(
                env_params, tr["inv"], tr["actions"])    # (T+1, B, D) i32
        elif env.name == "newsvendor":
            from or_gym_inventory_tpu.envs import newsvendor as fam_env
            tr = rollout_traj_nv(env_params, actor, log_std, seed, n_envs)
            obs_all = fam_env.assemble_obs_from_streams(
                env_params, tr["econ"], tr["orders"])    # (T+1, B, D) f32
        else:
            from or_gym_inventory_tpu.envs import \
                net_inv_management as fam_env
            from or_gym_inventory_tpu.ops.pallas_net_step import \
                rollout_traj_net
            tr = rollout_traj_net(env_params, actor, log_std, seed, n_envs)
            obs_all = fam_env.assemble_obs_from_streams(
                env_params, tr["x"], tr["u"], tr["r"])   # (T+1, B, D) f32
        raw = tr["raw"].transpose(0, 2, 1)               # (T, B, act_dim)
        reward_raw = tr["reward"]                        # (T, B)

        # running discounted return (reward-normalization statistics);
        # episodes start fresh each update, so the accumulator starts at 0
        def acc_step(acc, r):
            acc = acc * cfg.gamma + r
            return acc, acc

        _, ret_accs = jax.lax.scan(
            acc_step, jnp.zeros((n_envs,), jnp.float32), reward_raw)
        if cfg.normalize_reward:
            ret_rms = state.ret_rms.update(ret_accs.reshape(-1, 1),
                                           axis_name)
            scale = jax.lax.rsqrt(ret_rms.var[0] + 1e-8)
            reward = jnp.clip(reward_raw * scale, -10.0, 10.0)
        else:
            ret_rms = state.ret_rms
            reward = reward_raw

        D = obs_all.shape[-1]
        # rms statistics from the RAW obs, up front — the batch stores the
        # obs pre-normalized (with the pre-update statistics, matching the
        # XLA path's rollout-time normalization), optionally in bf16:
        # re-normalizing the int obs per minibatch per epoch was pure HBM
        # traffic on a bandwidth-bound phase
        rms = state.rms.update(obs_all[:T].reshape(-1, D), axis_name) \
            if cfg.normalize_obs else state.rms
        norm = state.rms.normalize if cfg.normalize_obs else \
            (lambda x: x.astype(jnp.float32))
        obs_n = norm(obs_all.reshape(-1, D))
        if cfg.compute_dtype is not None:
            obs_n = obs_n.astype(cfg.compute_dtype)

        def fwd(p, o):
            return apply_actor_critic(p, o, cfg, cfg.compute_dtype)

        # logp_old/values from the SAME obs tensor and forward the SGD
        # epochs will use — self-consistent across epochs by construction
        mean_all, _, value_all = fwd(state.params, obs_n)
        mean_all = mean_all.reshape(T + 1, n_envs, -1)
        value_all = value_all.reshape(T + 1, n_envs)
        logp = networks.gaussian_log_prob(raw, mean_all[:T], log_std)
        values = value_all[:T]
        bootstrap = value_all[T]                         # V(final obs)
        next_values = jnp.concatenate([values[1:], bootstrap[None]], axis=0)
        done = jnp.zeros((T, n_envs), bool).at[T - 1].set(True)
        advs = gae_advantages(reward, done, values, next_values)

        batch = dict(obs=obs_n.reshape(T + 1, n_envs, D)[:T], raw=raw,
                     logp=logp, value=values, adv=advs, ret=advs + values)
        params, opt_state, aux, _flat = sgd_phase(
            state, batch, n_envs, key, forward=fwd, pre_normalized=True)
        mean_step_reward = jnp.mean(reward_raw)
        if axis_name is not None:
            mean_step_reward = jax.lax.pmean(mean_step_reward, axis_name)
        pg_loss, v_loss, ent = jax.tree_util.tree_map(jnp.mean, aux)
        metrics = dict(
            mean_step_reward=mean_step_reward,
            episodes=jnp.asarray(n_envs, jnp.int32),
            pg_loss=pg_loss, v_loss=v_loss, entropy=ent)
        new_state = PPOTrainState(
            params=params, opt_state=opt_state, rms=rms, ret_rms=ret_rms,
            ret_accum=jnp.zeros_like(state.ret_accum),
            env_state=state.env_state, last_obs=state.last_obs,
            update_idx=state.update_idx + 1)
        return new_state, metrics

    def update(state: PPOTrainState, key: jax.Array):
        n_envs = state.last_obs.shape[0]

        # ---------------- rollout (fused policy+env scan) ----------------
        def scan_step(carry, _):
            env_state, obs, ret_accum, key = carry
            akey, skey, rkey, key = jax.random.split(key, 4)
            norm_obs = state.rms.normalize(obs) if cfg.normalize_obs \
                else obs.astype(jnp.float32)
            mean, log_std, value = model.apply(state.params, norm_obs)
            raw = networks.gaussian_sample(akey, mean, log_std)
            logp = networks.gaussian_log_prob(raw, mean, log_std)
            env_state, ts = vecenv.batch_step(
                env, env_params, env_state, to_env_action(raw), skey, n_envs)
            env_state, next_obs = vecenv.auto_reset(
                env, env_params, env_state, ts, rkey, n_envs)
            # running discounted return (for reward normalization stats)
            # VecNormalize order (SB3): accumulate THEN record, zero at
            # episode end AFTER recording — the full-episode discounted
            # return enters the statistics (the kernel path's acc_step
            # produces the identical stream for its episode-aligned case)
            ret_rec = ret_accum * cfg.gamma + ts.reward
            ret_accum = ret_rec * (1.0 - ts.done.astype(jnp.float32))
            out = dict(obs=obs, raw=raw, logp=logp, value=value,
                       reward=ts.reward, ret_accum=ret_rec,
                       done=ts.done, final_obs=ts.obs)
            return (env_state, next_obs, ret_accum, key), out

        roll_key, key = jax.random.split(key)
        (env_state, last_obs, ret_accum, _), tr = jax.lax.scan(
            scan_step,
            (state.env_state, state.last_obs, state.ret_accum, roll_key),
            None, length=cfg.rollout_steps)

        if cfg.normalize_reward:
            # scale rewards by the running std of discounted returns
            # (VecNormalize-style); statistics shared across shards
            ret_rms = state.ret_rms.update(
                tr["ret_accum"].reshape(-1, 1), axis_name)
            scale = jax.lax.rsqrt(ret_rms.var[0] + 1e-8)
            tr = dict(tr, raw_reward=tr["reward"],
                      reward=jnp.clip(tr["reward"] * scale, -10.0, 10.0))
        else:
            ret_rms = state.ret_rms

        # ------------------------------- GAE ------------------------------
        norm = state.rms.normalize if cfg.normalize_obs else \
            (lambda x: x.astype(jnp.float32))
        _, _, bootstrap = model.apply(state.params, norm(tr["final_obs"][-1]))

        # per-step bootstrap value: V(next_obs); where an episode ended
        # mid-rollout, the next value must come from the PRE-RESET final
        # obs of that step (fixed-horizon truncation semantics)
        values = tr["value"]
        next_values = jnp.concatenate([values[1:], bootstrap[None]], axis=0)
        _, _, v_final = model.apply(state.params, norm(
            tr["final_obs"].reshape(-1, tr["final_obs"].shape[-1])))
        v_final = v_final.reshape(values.shape)
        next_values = jnp.where(tr["done"], v_final, next_values)
        advs = gae_advantages(tr["reward"], tr["done"], values, next_values)

        # --------------------------- SGD epochs ---------------------------
        batch = dict(obs=tr["obs"], raw=tr["raw"], logp=tr["logp"],
                     value=values, adv=advs, ret=advs + values)
        params, opt_state, aux, flat = sgd_phase(state, batch, n_envs, key)

        rms = state.rms.update(flat["obs"], axis_name) if cfg.normalize_obs \
            else state.rms

        # ------------------------------ metrics ---------------------------
        ep_count = jnp.maximum(jnp.sum(tr["done"]), 1)
        raw_rewards = tr.get("raw_reward", tr["reward"])
        mean_reward_per_step = jnp.mean(raw_rewards)
        if axis_name is not None:
            mean_reward_per_step = jax.lax.pmean(mean_reward_per_step, axis_name)
        pg_loss, v_loss, ent = jax.tree_util.tree_map(jnp.mean, aux)
        metrics = dict(
            mean_step_reward=mean_reward_per_step,
            episodes=ep_count, pg_loss=pg_loss, v_loss=v_loss, entropy=ent)

        new_state = PPOTrainState(
            params=params, opt_state=opt_state, rms=rms, ret_rms=ret_rms,
            ret_accum=ret_accum, env_state=env_state, last_obs=last_obs,
            update_idx=state.update_idx + 1)
        return new_state, metrics

    return update_kernel if cfg.rollout == "kernel" else update


def train(env: Environment, env_params, cfg: PPOConfig, key: jax.Array,
          total_timesteps: int, mesh: Optional[Mesh] = None,
          axis_name: str = "env", progress=None):
    """Run PPO; returns (train_state, metrics_per_update dict of arrays).

    With ``mesh``, the whole update runs under shard_map: env batch sharded
    on ``axis_name``, params/opt-state replicated, grads pmean'd.
    """
    total_updates = cfg.num_updates(total_timesteps)
    update = make_update_fn(env, env_params, cfg, total_updates,
                            axis_name if mesh is not None else None)

    if mesh is None:
        state = init_train_state(env, env_params, cfg, key, total_updates)
        update_jit = jax.jit(update)
    else:
        n_dev = mesh.devices.size
        assert cfg.num_envs % n_dev == 0, (cfg.num_envs, n_dev)
        local = cfg.num_envs // n_dev

        def sharded_init(key):
            # key is REPLICATED: params identical on every shard; only the
            # env-reset stream differs (axis fold inside init_train_state)
            return init_train_state(env, env_params, cfg, key,
                                    total_updates, local_envs=local,
                                    axis_name=axis_name)

        state_spec = PPOTrainState(
            params=P(), opt_state=P(), rms=P(), ret_rms=P(),
            ret_accum=P(axis_name),
            env_state=P(axis_name), last_obs=P(axis_name), update_idx=P())
        init_fn = jax.shard_map(
            sharded_init, mesh=mesh, in_specs=P(),
            out_specs=state_spec, check_vma=False)
        state = jax.jit(init_fn)(key)

        def sharded_update(state, keys):
            key = jax.random.fold_in(keys[0], jax.lax.axis_index(axis_name))
            return update(state, key)

        update_sm = jax.shard_map(
            sharded_update, mesh=mesh,
            in_specs=(state_spec, P(axis_name)),
            out_specs=(state_spec, P()), check_vma=False)
        update_jit = jax.jit(update_sm)

    metrics_log = []
    chunk = max(1, min(cfg.updates_per_call, total_updates))
    if chunk > 1:
        # scan `chunk` updates inside one device program; one host
        # round-trip per chunk instead of per update
        base = update if mesh is None else update_sm  # noqa: F821
        chunk_jit = jax.jit(lambda st, ks: jax.lax.scan(base, st, ks))
        i = 0
        while i < total_updates:
            n = min(chunk, total_updates - i)
            key, ukey = jax.random.split(key)
            if mesh is None:
                keys = jax.random.split(ukey, n)
            else:
                keys = jax.random.split(ukey, n * mesh.devices.size)
                # old-style keys carry a trailing (2,) uint32 dim; keep it
                keys = keys.reshape(n, mesh.devices.size, *keys.shape[1:])
            state, ms = chunk_jit(state, keys)
            ms = {k: np.asarray(v) for k, v in ms.items()}
            for j in range(n):
                m = {k: float(ms[k][j]) for k in ms}
                m["update"] = i + j + 1
                m["timesteps"] = (i + j + 1) * cfg.num_envs * cfg.rollout_steps
                metrics_log.append(m)
            i += n
            if progress is not None:
                progress(metrics_log[-1], state)
    else:
        for i in range(total_updates):
            key, ukey = jax.random.split(key)
            ukeys = ukey if mesh is None else jax.random.split(
                ukey, mesh.devices.size)
            state, metrics = update_jit(state, ukeys)
            metrics = {k: float(v) for k, v in metrics.items()}
            metrics["update"] = i + 1
            metrics["timesteps"] = (i + 1) * cfg.num_envs * cfg.rollout_steps
            metrics_log.append(metrics)
            if progress is not None:
                progress(metrics, state)
    stacked = {k: np.array([m[k] for m in metrics_log])
               for k in metrics_log[0]} if metrics_log else {}
    return state, stacked


def make_eval_policy(env: Environment, env_params, cfg: PPOConfig,
                     deterministic: bool = True):
    """policy_fn(policy_state=(params, rms), obs, key, t) for vector eval."""
    model = _make_model(env, env_params, cfg)
    space = env.action_space(env_params)
    low = jnp.asarray(space.low, jnp.float32)
    high = jnp.asarray(np.where(np.isinf(space.high), 1e4, space.high), jnp.float32)
    int_actions = np.issubdtype(space.dtype, np.integer)

    def policy(policy_state, obs, key, _t):
        params, rms = policy_state
        norm_obs = rms.normalize(obs) if (cfg.normalize_obs and rms is not None) \
            else obs.astype(jnp.float32)
        mean, log_std, _ = model.apply(params, norm_obs)
        raw = mean if deterministic else networks.gaussian_sample(key, mean, log_std)
        a = networks.squash_action(raw, low, high)
        return a.astype(jnp.int32) if int_actions else a
    return policy


# ======================================================== host agent wrapper

class PPOAgent(BaseAgent):
    """Reference BaseAgent-protocol wrapper over the on-device PPO learner.

    Mirrors SB3AgentWrapper ergonomics (benchmark_InvManagementBacklogEnv.py:
    201-342): checkpoint shortcut unless force_retrain, save/load, training
    log for learning curves, deterministic eval actions.
    """

    def __init__(self, env: Environment, params_factory, name: str = "PPO",
                 config: Optional[PPOConfig] = None,
                 model_dir: str = "./models", log_dir: str = "./logs",
                 force_retrain: bool = False, mesh: Optional[Mesh] = None,
                 seed: int = 0, eval_every_updates: int = 0,
                 eval_episodes: int = 64):
        super().__init__(name=name)
        self.env = env
        self.params_factory = params_factory
        self.config = config or PPOConfig()
        self.model_dir, self.log_dir = model_dir, log_dir
        self.force_retrain = force_retrain
        self.mesh = mesh
        self.seed = seed
        # EvalCallback-equivalent (reference SB3AgentWrapper keeps the best
        # checkpoint from periodic deterministic evals and loads it after
        # training, benchmark_InvManagementBacklogEnv.py:275-281, 303-311).
        # 0 = disabled (final model used).
        self.eval_every_updates = eval_every_updates
        self.eval_episodes = eval_episodes
        self.env_params = None
        self.train_state = None
        self.training_log = None
        self._eval_policy = None

    # -- persistence -----------------------------------------------------
    def _ckpt_path(self, prefix=""):
        return os.path.join(self.model_dir, f"{prefix}{self.name}.msgpack")

    def save(self, path: Optional[str] = None):
        path = path or self._ckpt_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        payload = {"params": self.train_state.params,
                   "rms": dict(mean=self.train_state.rms.mean,
                               var=self.train_state.rms.var,
                               count=self.train_state.rms.count)}
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))
        write_ckpt_meta(path, getattr(self, "trained_timesteps", 0))
        return path

    def load(self, path: str):
        with open(path, "rb") as f:
            raw = f.read()
        if self.env_params is None:
            self.env_params = self.params_factory()
        total_updates = 1
        key = jax.random.PRNGKey(self.seed)
        tmpl = init_train_state(self.env, self.env_params, self.config, key,
                                total_updates, local_envs=1)
        payload = {"params": tmpl.params,
                   "rms": dict(mean=tmpl.rms.mean, var=tmpl.rms.var,
                               count=tmpl.rms.count)}
        restored = serialization.from_bytes(payload, raw)
        self.train_state = tmpl.replace(
            params=restored["params"],
            rms=RunningMeanStd(**restored["rms"]))
        self.trained_timesteps = ckpt_trained_timesteps(path)
        self._eval_policy = None

    # -- training --------------------------------------------------------
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
        print(f"Training {self.name} for {total_timesteps} steps...")
        start = time.time()
        key = jax.random.PRNGKey(self.seed)
        best = {"reward": -np.inf, "params": None, "rms": None}
        progress = None
        if self.eval_every_updates > 0:
            # EvalCallback equivalent: periodic deterministic eval, keep best
            from or_gym_inventory_tpu.vector import vecenv as _ve
            eval_pol = make_eval_policy(self.env, self.env_params, self.config)

            def progress(m, st):
                if m["update"] % self.eval_every_updates:
                    return
                totals, _ = _ve.evaluate_episodes(
                    self.env, self.env_params, eval_pol,
                    (st.params, st.rms), jax.random.PRNGKey(self.seed + 1),
                    self.eval_episodes)
                mean = float(np.mean(np.asarray(totals)))
                if mean > best["reward"]:
                    best.update(reward=mean, params=st.params, rms=st.rms)

        cfg = self.config
        if progress is not None and cfg.updates_per_call > 1 and \
                self.eval_every_updates % cfg.updates_per_call:
            # chunked training fires progress only at chunk boundaries; the
            # eval cadence is honored exactly iff the chunk divides
            # eval_every_updates. Pick the LARGEST such chunk (not the gcd
            # with the configured chunk, which can degrade to per-update
            # dispatch) so eval fires on schedule at minimum dispatch cost.
            # Call-local: self.config is never mutated.
            every = self.eval_every_updates
            aligned = every if every <= cfg.updates_per_call else max(
                d for d in range(1, cfg.updates_per_call + 1) if every % d == 0)
            cfg = cfg.replace(updates_per_call=aligned)
        state, metrics = train(self.env, self.env_params, cfg, key,
                               total_timesteps, mesh=self.mesh,
                               progress=progress)
        if best["params"] is not None:
            print(f"Loading best model (eval reward {best['reward']:.2f})")
            state = state.replace(params=best["params"], rms=best["rms"])
        self.train_state = state
        self._eval_policy = None
        self.training_log = metrics
        self.training_time = time.time() - start
        self.trained_timesteps = total_timesteps
        self.save(ckpt)
        if metrics:
            os.makedirs(self.log_dir, exist_ok=True)
            log_path = os.path.join(self.log_dir, f"{self.name}_train_log.csv")
            import csv
            with open(log_path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(metrics.keys()))
                w.writeheader()
                for i in range(len(metrics["update"])):
                    w.writerow({k: metrics[k][i] for k in metrics})
        print(f"Training for {self.name} finished in {self.training_time:.2f}s "
              f"({total_timesteps / max(self.training_time, 1e-9):,.0f} "
              f"trained-steps/s)")

    # -- evaluation ------------------------------------------------------
    def _ensure_policy(self):
        """Single-obs host eval is latency-bound: pin a CPU copy of the
        policy state and a CPU-jitted apply (a per-step accelerator
        round-trip would dominate episode time)."""
        if self._eval_policy is None:
            policy = make_eval_policy(self.env, self.env_params, self.config)
            ps = (self.train_state.params, self.train_state.rms)
            key = jax.random.PRNGKey(0)
            try:
                cpu = jax.local_devices(backend="cpu")[0]
                ps = jax.device_put(ps, cpu)
                key = jax.device_put(key, cpu)
            except RuntimeError:
                pass
            self._eval_policy = jax.jit(policy)
            self._eval_ps = ps
            self._eval_key = key
        return self._eval_policy

    def get_action(self, observation, env):
        if self.train_state is None:
            a = env.action_space.sample()
            return a.astype(env.action_space.dtype)
        policy = self._ensure_policy()
        obs = np.asarray(observation, np.float32)[None]
        a = policy(self._eval_ps, obs, self._eval_key, np.zeros((), np.int32))
        return np.asarray(a[0]).astype(env.action_space.dtype)

    def device_policy(self, env, params):
        policy = make_eval_policy(self.env, self.env_params or params,
                                  self.config)
        ps = (self.train_state.params, self.train_state.rms)
        return lambda _s, obs, key, t: policy(ps, obs, key, t)
