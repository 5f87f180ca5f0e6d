"""Recurrent PPO (LSTM actor-critic).

The reference roster requests "MlpLstmPolicy" for PPO_LSTM/A2C_LSTM
(benchmark_InvManagementBacklogEnv.py:712-713) — which stock SB3 cannot
provide (recurrent policies live in sb3-contrib; see SURVEY.md §4). This is
the working TPU-native counterpart: an LSTM actor-critic trained with PPO,
hidden state threaded through the fused rollout scan and recomputed by
sequence scan during the update (minibatches are slices of the env axis so
sequences stay whole — the standard recurrent-PPO recipe).
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from or_gym_inventory_tpu.agents import networks
from or_gym_inventory_tpu.agents.ppo import (PPOAgent, PPOConfig,
                                             RunningMeanStd, _optimizer)
from or_gym_inventory_tpu.envs.base import Environment
from or_gym_inventory_tpu.vector import vecenv


@struct.dataclass
class RecurrentPPOConfig(PPOConfig):
    hidden: int = struct.field(pytree_node=False, default=128)
    encoder: Tuple[int, ...] = struct.field(pytree_node=False, default=(64,))


@struct.dataclass
class RPPOTrainState:
    params: dict
    opt_state: optax.OptState
    rms: RunningMeanStd
    ret_rms: RunningMeanStd
    ret_accum: jax.Array
    env_state: object
    last_obs: jax.Array
    last_done: jax.Array
    carry: Tuple[jax.Array, jax.Array]
    update_idx: jax.Array


def _make_model(env, env_params, cfg: RecurrentPPOConfig):
    space = env.action_space(env_params)
    return networks.LSTMActorCritic(
        action_dim=int(np.prod(space.shape)), hidden=cfg.hidden,
        encoder=cfg.encoder, activation=cfg.activation)


def make_train_fns(env: Environment, env_params, cfg: RecurrentPPOConfig,
                   total_updates: int, axis_name=None, local_envs=None):
    """With ``axis_name`` set (inside shard_map), the env batch and LSTM
    carries shard over the mesh (``local_envs`` per shard); params replicate
    and gradients/normalization statistics psum — same data-parallel layout
    as agents/ppo.py. Minibatches slice each shard's local env axis, so
    sequences stay whole per shard."""
    n_envs_local = local_envs or cfg.num_envs
    model = _make_model(env, env_params, cfg)
    space = env.action_space(env_params)
    low = jnp.asarray(space.low, jnp.float32)
    high = jnp.asarray(np.where(np.isinf(space.high), 1e4, space.high), jnp.float32)
    int_actions = np.issubdtype(space.dtype, np.integer)
    obs_dim = env.observation_space(env_params).shape[0]
    tx = _optimizer(cfg, total_updates)

    def to_env_action(raw):
        a = networks.squash_action(raw, low, high)
        return a.astype(jnp.int32) if int_actions else a

    if cfg.rollout not in ("xla", "kernel"):
        raise ValueError(f"rollout must be 'xla' or 'kernel', got "
                         f"{cfg.rollout!r}")
    if cfg.rollout == "kernel":
        if getattr(env, "name", None) != "inv_management":
            raise NotImplementedError(
                "RecurrentPPO rollout='kernel' currently supports the "
                "InvManagement family (the LSTM trajectory kernel, "
                "ops/pallas_episode_kernels.rollout_traj_im_lstm); got "
                f"{getattr(env, 'name', None)!r}")
        horizon = env.horizon(env_params)
        if cfg.rollout_steps != horizon:
            raise ValueError(
                "rollout='kernel' runs episode-aligned updates: "
                f"rollout_steps ({cfg.rollout_steps}) must equal the env "
                f"horizon ({horizon})")
        if n_envs_local % 1024:
            raise ValueError(
                "rollout='kernel' needs num_envs to be a multiple of 1024 "
                f"(the kernel block size); got {n_envs_local} per shard")
        if jax.default_backend() != "tpu":
            raise RuntimeError(
                "rollout='kernel' needs the TPU backend (Pallas episode "
                "kernels); use rollout='xla' elsewhere")

    def gae_step(c, inp):
        next_adv, next_value = c
        reward, done, value = inp
        nd = 1.0 - done.astype(jnp.float32)
        delta = reward + cfg.gamma * next_value - value
        adv = delta + cfg.gamma * cfg.gae_lambda * nd * next_adv
        return (adv, value), adv

    def sgd_epochs(state, batch, init_carry, key, norm, n_envs):
        """Epochs of env-sliced minibatch SGD with the LSTM re-run over
        each slice's whole sequence — shared by both rollout backends."""
        n_mb = cfg.num_minibatches
        assert n_envs % n_mb == 0
        envs_per_mb = n_envs // n_mb

        def loss_fn(params, mb):
            # re-run the LSTM over the whole sequence for this env slice
            def cell(carry, inp):
                obs, done_in = inp
                carry, out = model.apply(params, carry, norm(obs), done_in)
                return carry, out
            _, (mean, log_std, value) = jax.lax.scan(
                cell, mb["init_carry"], (mb["obs"], mb["done_in"]))
            # log_std is a module param (act_dim,) stacked to (T, act_dim)
            # by the scan; lift it to (T, mb, act_dim) to match mean
            log_std = jnp.broadcast_to(log_std[:, None, :], mean.shape)
            logp = networks.gaussian_log_prob(mb["raw"], mean, log_std)
            ratio = jnp.exp(logp - mb["logp"])
            adv = (mb["adv"] - mb["adv"].mean()) / (mb["adv"].std() + 1e-8)
            pg = -jnp.minimum(
                ratio * adv,
                jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv).mean()
            v_loss = 0.5 * ((value - mb["ret"]) ** 2).mean()
            ent = networks.entropy_bonus(log_std).mean()
            return pg + cfg.vf_coef * v_loss - cfg.ent_coef * ent, (pg, v_loss, ent)

        def epoch(carry_in, ekey):
            params, opt_state = carry_in
            perm = jax.random.permutation(ekey, n_envs)

            def minibatch(carry_in, mb_idx):
                params, opt_state = carry_in
                idx = jax.lax.dynamic_slice_in_dim(
                    perm, mb_idx * envs_per_mb, envs_per_mb)
                mb = {k: v[:, idx] for k, v in batch.items()}
                mb["init_carry"] = jax.tree_util.tree_map(
                    lambda c: c[idx], init_carry)
                grads, aux = jax.grad(loss_fn, has_aux=True)(params, mb)
                if axis_name is not None:
                    grads = jax.lax.pmean(grads, axis_name)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), aux = jax.lax.scan(
                minibatch, (params, opt_state), jnp.arange(n_mb))
            return (params, opt_state), aux

        epoch_keys = jax.random.split(key, cfg.update_epochs)
        (params, opt_state), aux = jax.lax.scan(
            epoch, (state.params, state.opt_state), epoch_keys)
        return params, opt_state, aux

    def init(key) -> RPPOTrainState:
        # params (pkey) draw from the caller's key — under a mesh that key
        # is REPLICATED so replicas start byte-identical; only the env-reset
        # stream (rkey) is per-shard
        pkey, rkey = jax.random.split(key)
        if axis_name is not None:
            rkey = jax.random.fold_in(rkey, jax.lax.axis_index(axis_name))
        carry0 = model.initial_carry(n_envs_local)
        params = model.init(pkey, carry0, jnp.zeros((n_envs_local, obs_dim),
                                                    jnp.float32))
        env_state, ts0 = vecenv.batch_reset(env, env_params, rkey, n_envs_local)
        return RPPOTrainState(
            params=params, opt_state=tx.init(params),
            rms=RunningMeanStd.create(obs_dim),
            ret_rms=RunningMeanStd.create(1),
            ret_accum=jnp.zeros((n_envs_local,), jnp.float32),
            env_state=env_state,
            last_obs=ts0.obs, last_done=jnp.zeros((n_envs_local,), bool),
            carry=carry0, update_idx=jnp.zeros((), jnp.int32))

    def update(state: RPPOTrainState, key: jax.Array):
        n_envs = state.last_obs.shape[0]  # local batch under a mesh
        norm = state.rms.normalize if cfg.normalize_obs else \
            (lambda x: x.astype(jnp.float32))
        init_carry = state.carry

        def scan_step(scan_carry, _):
            env_state, obs, done, carry, ret_accum, key = scan_carry
            akey, skey, rkey, key = jax.random.split(key, 4)
            carry, (mean, log_std, value) = model.apply(
                state.params, carry, norm(obs), done)
            raw = networks.gaussian_sample(akey, mean, log_std)
            logp = networks.gaussian_log_prob(raw, mean, log_std)
            env_state, ts = vecenv.batch_step(
                env, env_params, env_state, to_env_action(raw), skey, n_envs)
            env_state, next_obs = vecenv.auto_reset(
                env, env_params, env_state, ts, rkey, n_envs)
            # VecNormalize order: accumulate THEN record, zero AFTER (the
            # full-episode return enters the statistics; agents/ppo.py)
            ret_rec = ret_accum * cfg.gamma + ts.reward
            ret_accum = ret_rec * (1.0 - ts.done.astype(jnp.float32))
            out = dict(obs=obs, done_in=done, raw=raw, logp=logp, value=value,
                       reward=ts.reward, ret_accum=ret_rec,
                       done=ts.done, final_obs=ts.obs)
            return (env_state, next_obs, ts.done, carry, ret_accum, key), out

        roll_key, key = jax.random.split(key)
        (env_state, last_obs, last_done, carry, ret_accum, _), tr = \
            jax.lax.scan(
                scan_step,
                (state.env_state, state.last_obs, state.last_done, init_carry,
                 state.ret_accum, roll_key), None, length=cfg.rollout_steps)

        raw_rewards = tr["reward"]
        if cfg.normalize_reward:
            ret_rms = state.ret_rms.update(tr["ret_accum"].reshape(-1, 1),
                                           axis_name)
            scale = jax.lax.rsqrt(ret_rms.var[0] + 1e-8)
            tr = dict(tr, reward=jnp.clip(tr["reward"] * scale, -10.0, 10.0))
        else:
            ret_rms = state.ret_rms

        # bootstrap with the post-rollout carry
        _, (_, _, bootstrap) = model.apply(state.params, carry,
                                           norm(last_obs), last_done)

        values = tr["value"]
        (_, _), advs = jax.lax.scan(
            gae_step, (jnp.zeros_like(bootstrap), bootstrap),
            (tr["reward"], tr["done"], values), reverse=True)
        returns = advs + values

        batch = dict(obs=tr["obs"], done_in=tr["done_in"], raw=tr["raw"],
                     logp=tr["logp"], adv=advs, ret=returns)
        params, opt_state, aux = sgd_epochs(state, batch, init_carry, key,
                                            norm, n_envs)

        rms = state.rms.update(tr["obs"].reshape(-1, obs_dim), axis_name) \
            if cfg.normalize_obs else state.rms
        pg_loss, v_loss, ent = jax.tree_util.tree_map(jnp.mean, aux)
        mean_step_reward = jnp.mean(raw_rewards)
        if axis_name is not None:
            mean_step_reward = jax.lax.pmean(mean_step_reward, axis_name)
        metrics = dict(mean_step_reward=mean_step_reward,
                       pg_loss=pg_loss, v_loss=v_loss, entropy=ent)
        new_state = RPPOTrainState(
            params=params, opt_state=opt_state, rms=rms, ret_rms=ret_rms,
            ret_accum=ret_accum, env_state=env_state,
            last_obs=last_obs, last_done=last_done, carry=carry,
            update_idx=state.update_idx + 1)
        return new_state, metrics

    # ------------------- kernel-rollout update (TPU, IM family)
    def update_kernel(state: RPPOTrainState, key: jax.Array):
        """One episode-aligned recurrent-PPO update off the LSTM
        trajectory-emitting Pallas rollout: encoder + recurrent cell +
        mean head run in-kernel with the (hidden, lanes) carry
        VMEM-resident and Box-Muller exploration noise; the dumped
        streams reconstruct the obs batch, and logp/values come from the
        SAME XLA carry-threaded re-forward the SGD epochs run (zero
        initial carry, done_in[0]=True — episodes start fresh each
        update), so logp_old/logp_new are self-consistent by
        construction."""
        from or_gym_inventory_tpu.envs import inv_management as fam_env
        from or_gym_inventory_tpu.ops.pallas_episode_kernels import (
            fold_lstm_actor, rollout_traj_im_lstm)
        n_envs = state.last_obs.shape[0]
        T = cfg.rollout_steps
        norm = state.rms.normalize if cfg.normalize_obs else \
            (lambda x: x.astype(jnp.float32))

        seed_key, key = jax.random.split(key)
        seed = jax.random.randint(seed_key, (), 0, 2 ** 31 - 1)
        actor = fold_lstm_actor(
            cfg, state.params, state.rms if cfg.normalize_obs else None)
        log_std = state.params["params"]["log_std"]
        tr = rollout_traj_im_lstm(env_params, actor, log_std, seed, n_envs)
        obs_all = fam_env.assemble_obs_from_streams(
            env_params, tr["inv"], tr["actions"])         # (T+1, B, D) i32
        raw = tr["raw"].transpose(0, 2, 1)                # (T, B, act_dim)
        reward_raw = tr["reward"]                         # (T, B)

        # reward-normalization statistics: episode-aligned accumulator
        # (VecNormalize order — the full-episode return enters ret_rms)
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

        obs_seq = obs_all[:T]
        done_in = jnp.zeros((T, n_envs), bool).at[0].set(True)
        init_carry = model.initial_carry(n_envs)

        def cell(carry, inp):
            obs, d = inp
            carry, out = model.apply(state.params, carry, norm(obs), d)
            return carry, out

        carry_T, (mean, log_std_b, values) = jax.lax.scan(
            cell, init_carry, (obs_seq, done_in))
        log_std_b = jnp.broadcast_to(log_std_b[:, None, :], mean.shape)
        logp = networks.gaussian_log_prob(raw, mean, log_std_b)
        # truncation bootstrap: the XLA path's convention — apply on the
        # final obs with done=True (fresh carry at the episode boundary)
        _, (_, _, bootstrap) = model.apply(
            state.params, carry_T, norm(obs_all[T]),
            jnp.ones((n_envs,), bool))
        done = jnp.zeros((T, n_envs), bool).at[T - 1].set(True)
        (_, _), advs = jax.lax.scan(
            gae_step, (jnp.zeros_like(bootstrap), bootstrap),
            (reward, done, values), reverse=True)
        returns = advs + values

        batch = dict(obs=obs_seq, done_in=done_in, raw=raw, logp=logp,
                     adv=advs, ret=returns)
        params, opt_state, aux = sgd_epochs(state, batch, init_carry, key,
                                            norm, n_envs)

        rms = state.rms.update(obs_seq.reshape(-1, obs_dim), axis_name) \
            if cfg.normalize_obs else state.rms
        pg_loss, v_loss, ent = jax.tree_util.tree_map(jnp.mean, aux)
        mean_step_reward = jnp.mean(reward_raw)
        if axis_name is not None:
            mean_step_reward = jax.lax.pmean(mean_step_reward, axis_name)
        metrics = dict(mean_step_reward=mean_step_reward,
                       pg_loss=pg_loss, v_loss=v_loss, entropy=ent)
        new_state = RPPOTrainState(
            params=params, opt_state=opt_state, rms=rms, ret_rms=ret_rms,
            ret_accum=jnp.zeros_like(state.ret_accum),
            env_state=state.env_state, last_obs=state.last_obs,
            last_done=state.last_done, carry=state.carry,
            update_idx=state.update_idx + 1)
        return new_state, metrics

    def eval_policy(policy_state, obs, key, t):
        """Stateless-per-step eval: (params, rms, carry-in-closure) is not
        possible in the vector API, so eval threads the carry via vmapped
        scan in evaluate; here we expose a step fn for custom loops."""
        raise NotImplementedError("use eval_episode for recurrent policies")

    def eval_episodes(params, rms, key, num_envs):
        """Deterministic full-horizon evaluation with hidden-state threading."""
        horizon = env.horizon(env_params)
        rkey, key = jax.random.split(key)
        env_state, ts0 = vecenv.batch_reset(env, env_params, rkey, num_envs)
        carry0 = model.initial_carry(num_envs)
        normf = rms.normalize if cfg.normalize_obs else \
            (lambda x: x.astype(jnp.float32))

        def scan_step(c, _):
            env_state, obs, done, carry, key = c
            skey, key = jax.random.split(key)
            carry, (mean, _, _) = model.apply(params, carry, normf(obs), done)
            env_state, ts = vecenv.batch_step(
                env, env_params, env_state, to_env_action(mean), skey, num_envs)
            return (env_state, ts.obs, ts.done, carry, key), ts.reward

        (_, _, _, _, _), rewards = jax.lax.scan(
            scan_step,
            (env_state, ts0.obs, jnp.zeros((num_envs,), bool), carry0, key),
            None, length=horizon)
        return jnp.sum(rewards, axis=0)

    return init, (update_kernel if cfg.rollout == "kernel" else update), \
        eval_episodes


def train(env: Environment, env_params, cfg: RecurrentPPOConfig,
          key: jax.Array, total_timesteps: int, progress=None,
          mesh=None, axis_name: str = "env"):
    """With ``mesh``, the env batch + LSTM carries shard over ``axis_name``;
    params replicate, grads pmean — same layout as agents/ppo.train."""
    from jax.sharding import PartitionSpec as P

    total_updates = cfg.num_updates(total_timesteps)
    if mesh is None:
        init, update, eval_episodes = make_train_fns(env, env_params, cfg,
                                                     total_updates)
        state = jax.jit(init)(key)
        update_jit = jax.jit(update)
    else:
        n_dev = mesh.devices.size
        assert cfg.num_envs % n_dev == 0, (cfg.num_envs, n_dev)
        local = cfg.num_envs // n_dev
        assert local % cfg.num_minibatches == 0, (
            "per-shard env count must divide into minibatches", local,
            cfg.num_minibatches)
        init, update, eval_episodes = make_train_fns(
            env, env_params, cfg, total_updates, axis_name=axis_name,
            local_envs=local)
        state_spec = RPPOTrainState(
            params=P(), opt_state=P(), rms=P(), ret_rms=P(),
            ret_accum=P(axis_name), env_state=P(axis_name),
            last_obs=P(axis_name), last_done=P(axis_name),
            carry=P(axis_name), update_idx=P())

        # init key REPLICATED: params identical per shard, env streams forked
        # inside init via axis_index
        init_fn = jax.shard_map(init, mesh=mesh, in_specs=P(),
                                out_specs=state_spec, check_vma=False)
        state = jax.jit(init_fn)(key)

        def sharded_update(state, keys):
            k = jax.random.fold_in(keys[0], jax.lax.axis_index(axis_name))
            return update(state, k)

        update_sm = jax.shard_map(
            sharded_update, mesh=mesh, in_specs=(state_spec, P(axis_name)),
            out_specs=(state_spec, P()), check_vma=False)
        update_jit = jax.jit(update_sm)

    metrics_log = []
    chunk = max(1, min(cfg.updates_per_call, total_updates))
    if chunk > 1:
        # one device program per `chunk` updates (see agents/ppo.train)
        base = update if mesh is None else update_sm  # noqa: F821
        chunk_jit = jax.jit(lambda st, ks: jax.lax.scan(base, st, ks))
        i = 0
        while i < total_updates:
            n = min(chunk, total_updates - i)
            key, ukey = jax.random.split(key)
            keys = jax.random.split(
                ukey, n if mesh is None else n * mesh.devices.size)
            if mesh is not None:
                keys = keys.reshape(n, mesh.devices.size, *keys.shape[1:])
            state, ms = chunk_jit(state, keys)
            ms = {k: np.asarray(v) for k, v in ms.items()}
            for j in range(n):
                m = {k: float(ms[k][j]) for k in ms}
                m["update"] = i + j + 1
                m["timesteps"] = (i + j + 1) * cfg.num_envs * cfg.rollout_steps
                metrics_log.append(m)
            i += n
            if progress:
                progress(metrics_log[-1], state)
    else:
        for i in range(total_updates):
            key, ukey = jax.random.split(key)
            if mesh is not None:
                ukey = jax.random.split(ukey, mesh.devices.size)
            state, metrics = update_jit(state, ukey)
            m = {k: float(v) for k, v in metrics.items()}
            m["update"] = i + 1
            m["timesteps"] = (i + 1) * cfg.num_envs * cfg.rollout_steps
            metrics_log.append(m)
            if progress:
                progress(m, state)
    stacked = {k: np.array([mm[k] for mm in metrics_log])
               for k in metrics_log[0]} if metrics_log else {}
    return state, eval_episodes, stacked


class RecurrentPPOAgent(PPOAgent):
    """Host wrapper (BaseAgent protocol) for the LSTM PPO."""

    def __init__(self, env, params_factory, name="PPO_LSTM",
                 config: Optional[RecurrentPPOConfig] = None, **kwargs):
        super().__init__(env, params_factory, name=name,
                         config=config or RecurrentPPOConfig(), **kwargs)
        self._carry = None
        self._model = None

    def train(self, env_config: dict, total_timesteps: int,
              save_path_prefix: str = ""):
        from or_gym_inventory_tpu.agents.base import ckpt_trained_timesteps
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
        state, eval_episodes, metrics = train(
            self.env, self.env_params, self.config,
            jax.random.PRNGKey(self.seed), total_timesteps, mesh=self.mesh)
        self.train_state = state
        self.training_log = metrics
        self.training_time = time.time() - start
        self.trained_timesteps = total_timesteps
        self.save(ckpt)
        if metrics:  # same *_train_log.csv the learning-curve plot reads
            os.makedirs(self.log_dir, exist_ok=True)
            log_path = os.path.join(self.log_dir,
                                    f"{self.name}_train_log.csv")
            import csv
            with open(log_path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(metrics.keys()))
                w.writeheader()
                for i in range(len(metrics["update"])):
                    w.writerow({k: metrics[k][i] for k in metrics})
        print(f"Training for {self.name} finished in {self.training_time:.2f}s "
              f"({total_timesteps / max(self.training_time, 1e-9):,.0f} "
              f"trained-steps/s)")

    def load(self, path: str):
        from flax import serialization
        if self.env_params is None:
            self.env_params = self.params_factory()
        init, _, _ = make_train_fns(self.env, self.env_params, self.config, 1)
        tmpl = jax.jit(init)(jax.random.PRNGKey(self.seed))
        payload = {"params": tmpl.params,
                   "rms": dict(mean=tmpl.rms.mean, var=tmpl.rms.var,
                               count=tmpl.rms.count)}
        with open(path, "rb") as f:
            restored = serialization.from_bytes(payload, f.read())
        self.train_state = tmpl.replace(
            params=restored["params"], rms=RunningMeanStd(**restored["rms"]))
        from or_gym_inventory_tpu.agents.base import ckpt_trained_timesteps
        self.trained_timesteps = ckpt_trained_timesteps(path)

    def _ensure_model(self):
        if self._model is None:
            self._model = _make_model(self.env, self.env_params, self.config)
            self._step_fn = jax.jit(
                lambda params, carry, obs, done: self._model.apply(
                    params, carry, obs, done))
        return self._model

    def get_action(self, observation, env):
        if self.train_state is None:
            return env.action_space.sample().astype(env.action_space.dtype)
        model = self._ensure_model()
        period = int(getattr(env, "period", getattr(env, "step_count", 0)))
        if self._carry is None or period == 0:
            self._carry = model.initial_carry(1)
        obs = jnp.asarray(observation, jnp.float32)[None]
        nobs = self.train_state.rms.normalize(obs) if self.config.normalize_obs \
            else obs
        self._carry, (mean, _, _) = self._step_fn(
            self.train_state.params, self._carry, nobs,
            jnp.zeros((1,), bool))
        space = env.action_space
        low = np.asarray(space.low, np.float32)
        high = np.where(np.isinf(space.high), 1e4, space.high).astype(np.float32)
        a = networks.squash_action(mean[0], jnp.asarray(low), jnp.asarray(high))
        return np.asarray(a).astype(space.dtype)

    def device_policy(self, env, params):
        return None  # stateless protocol can't thread the carry; see below

    def device_policy_stateful(self, env, params):
        """(carry0_fn, policy_fn) for the carry-threading vectorized
        evaluator (vecenv.evaluate_episodes_seeded_stateful) — the device
        path that lets ``fast=True`` cover recurrent agents instead of
        silently falling back to host episodes."""
        if self.train_state is None:
            return None
        env_params = self.env_params or params
        model = _make_model(env, env_params, self.config)
        space = env.action_space(env_params)
        low = jnp.asarray(space.low, jnp.float32)
        high = jnp.asarray(np.where(np.isinf(space.high), 1e4, space.high),
                           jnp.float32)
        int_actions = np.issubdtype(space.dtype, np.integer)
        st = self.train_state
        normf = st.rms.normalize if self.config.normalize_obs else \
            (lambda x: x.astype(jnp.float32))

        def carry0_fn(num_envs):
            return model.initial_carry(num_envs)

        def policy_fn(carry, obs, _key, _t):
            done = jnp.zeros((obs.shape[0],), bool)  # full-horizon episodes
            carry, (mean, _, _) = model.apply(st.params, carry, normf(obs),
                                              done)
            a = networks.squash_action(mean, low, high)
            return carry, (a.astype(jnp.int32) if int_actions else a)

        return carry0_fn, policy_fn


def A2CLSTMConfig(num_envs: int = 256, rollout_steps: int = 8, lr: float = 7e-4,
                  gamma: float = 0.99, gae_lambda: float = 1.0,
                  hidden: int = 128, encoder: Tuple[int, ...] = (64,),
                  **kw) -> RecurrentPPOConfig:
    """SB3-A2C-shaped defaults on the recurrent machinery — the reference's
    A2C_LSTM roster entry ("MlpLstmPolicy" A2C,
    benchmark_InvManagementBacklogEnv.py:713): one epoch, one full-batch
    minibatch, effectively-unclipped ratio, RMSprop, no LR anneal (the same
    recipe as agents/a2c.A2CConfig, plus the LSTM core)."""
    return RecurrentPPOConfig(
        num_envs=num_envs, rollout_steps=rollout_steps, lr=lr, gamma=gamma,
        gae_lambda=gae_lambda, clip_eps=10.0, update_epochs=1,
        num_minibatches=1, ent_coef=0.0, vf_coef=0.5, max_grad_norm=0.5,
        anneal_lr=False, optimizer="rmsprop", hidden=hidden, encoder=encoder,
        **kw)


class A2CLSTMAgent(RecurrentPPOAgent):
    def __init__(self, env, params_factory, name: str = "A2C_LSTM",
                 config: Optional[RecurrentPPOConfig] = None, **kwargs):
        super().__init__(env, params_factory, name=name,
                         config=config or A2CLSTMConfig(), **kwargs)
