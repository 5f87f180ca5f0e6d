"""Vectorized env execution: vmap batching, auto-reset, lax.scan rollouts.

The reference's only batching was SB3 ``DummyVecEnv`` with n_envs=1
(benchmark_InvManagementBacklogEnv.py:269-271; SubprocVecEnv imported but
disabled). The TPU-native replacement holds thousands of env states per chip
under ``vmap`` and runs episode time under ``lax.scan`` with a static horizon
— every reference family truncates at a fixed step limit (newsvendor.py:190,
inventory_management.py:350, network_management.py:624), so batches stay in
lockstep and auto-reset is an elementwise ``where``.

``rollout`` is the single hot loop of the framework: policy inference and env
step fused in one jitted scan (the design replaces the reference's
actor/learner process split, SURVEY.md §2.5).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from or_gym_inventory_tpu.core.struct import TimeStep
from or_gym_inventory_tpu.envs.base import Environment


class Trajectory(NamedTuple):
    """Stacked scan outputs, time-major: (T, num_envs, ...)."""
    obs: jax.Array        # observation the action was computed from
    action: jax.Array
    reward: jax.Array
    done: jax.Array
    next_obs: jax.Array   # post-step obs (pre-auto-reset; bootstrap target)
    info: dict


def batch_reset(env: Environment, params, key: jax.Array, num_envs: int):
    keys = jax.random.split(key, num_envs)
    return jax.vmap(env.reset, in_axes=(None, 0))(params, keys)


def batch_step(env: Environment, params, state, action, key: jax.Array,
               num_envs: int):
    keys = jax.random.split(key, num_envs)
    return jax.vmap(env.step, in_axes=(None, 0, 0, 0))(params, state, action, keys)


def auto_reset(env: Environment, params, state, ts: TimeStep, key: jax.Array,
               num_envs: int):
    """Replace done env states with fresh resets; returns (state, next_obs).

    ``ts`` is left untouched (its obs/reward are the final step's values —
    the PPO learner bootstraps from ``ts.obs`` and masks with ``done``)."""
    reset_state, reset_ts = batch_reset(env, params, key, num_envs)
    done = ts.done

    def select(new, old):
        d = done.reshape(done.shape + (1,) * (new.ndim - done.ndim))
        return jnp.where(d, new, old)

    state = jax.tree_util.tree_map(select, reset_state, state)
    next_obs = select(reset_ts.obs, ts.obs)
    return state, next_obs


def rollout(env: Environment, params, policy_fn: Callable, policy_state,
            key: jax.Array, num_envs: int, num_steps: int,
            init_carry: Optional[Any] = None):
    """Run ``num_steps`` across ``num_envs`` instances in one fused scan.

    ``policy_fn(policy_state, obs_batch, key, t) -> action_batch`` is any
    pure function (heuristic policies, flax MLP apply, random); ``t`` is the
    scan step index (time-dependent heuristics like base-stock need the
    in-episode period; under lockstep fixed horizons the two coincide when
    the rollout starts at reset). Returns ``((state, obs, key), Trajectory)``;
    pass the carry back in to continue a rollout across learner updates
    without re-resetting.
    """
    if init_carry is None:
        reset_key, key = jax.random.split(key)
        state, ts0 = batch_reset(env, params, reset_key, num_envs)
        obs = ts0.obs
    else:
        state, obs = init_carry

    def scan_step(carry, t):
        state, obs, key = carry
        act_key, step_key, reset_key, key = jax.random.split(key, 4)
        action = policy_fn(policy_state, obs, act_key, t)
        state, ts = batch_step(env, params, state, action, step_key, num_envs)
        state, next_obs = auto_reset(env, params, state, ts, reset_key, num_envs)
        traj = Trajectory(obs=obs, action=action, reward=ts.reward,
                          done=ts.done, next_obs=ts.obs, info=ts.info)
        return (state, next_obs, key), traj

    (state, obs, key), traj = jax.lax.scan(
        scan_step, (state, obs, key), jnp.arange(num_steps))
    return (state, obs, key), traj


@partial(jax.jit, static_argnums=(0, 1, 2))
def evaluate_episodes_seeded(env: Environment, params, policy_fn: Callable,
                             policy_state, seeds: jax.Array):
    """One fixed-horizon episode per lane, lane i driven ONLY by ``seeds[i]``.

    This is the device analogue of the reference's seeding protocol — episode
    i is seeded ``seed_offset + i`` (benchmark_newsvendor.py:227-228) — so a
    device-path row is episode-for-episode comparable to a host-path row with
    the same Seed value: lane i's reset key and every per-step env key are
    ``fold_in(PRNGKey(seeds[i]), ·)``, independent of batch size or the other
    lanes. (The *bit streams* still differ from NumPy PCG64, as documented in
    BASELINE.md; comparability means the per-episode randomness is a pure
    function of the recorded seed on both paths.)

    Returns (totals, trajectory) like ``evaluate_episodes``.
    """
    horizon = env.horizon(params)
    base = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds, jnp.uint32))
    reset_keys = jax.vmap(jax.random.fold_in, (0, None))(base, 0)
    state, ts0 = jax.vmap(env.reset, in_axes=(None, 0))(params, reset_keys)

    def scan_step(carry, t):
        state, obs = carry
        # per-lane env stream: fold_in(base_i, 1 + t); action keys come from a
        # disjoint tag range so stochastic policies don't alias the env stream
        step_keys = jax.vmap(jax.random.fold_in, (0, None))(base, 1 + t)
        act_key = jax.random.fold_in(base[0], 1 + horizon + t)
        action = policy_fn(policy_state, obs, act_key, t)
        state, ts = jax.vmap(env.step, in_axes=(None, 0, 0, 0))(
            params, state, action, step_keys)
        traj = Trajectory(obs=obs, action=action, reward=ts.reward,
                          done=ts.done, next_obs=ts.obs, info=ts.info)
        return (state, ts.obs), traj

    (state, _), traj = jax.lax.scan(
        scan_step, (state, ts0.obs), jnp.arange(horizon))
    totals = jnp.sum(traj.reward, axis=0)
    return totals, traj


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def evaluate_episodes_seeded_stateful(env: Environment, params,
                                      carry0_fn: Callable,
                                      policy_fn: Callable,
                                      seeds: jax.Array):
    """``evaluate_episodes_seeded`` for STATEFUL policies (recurrent
    actors): ``carry0_fn(num_envs)`` builds the initial policy carry and
    ``policy_fn(carry, obs_batch, key, t) -> (carry, action_batch)``
    threads it through the episode scan — the device path for PPO_LSTM /
    A2C_LSTM (the reference's MlpLstmPolicy intent,
    benchmark_InvManagementBacklogEnv.py:712-713). Seeding protocol and
    return layout are identical to :func:`evaluate_episodes_seeded`."""
    horizon = env.horizon(params)
    num_envs = seeds.shape[0]
    base = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds, jnp.uint32))
    reset_keys = jax.vmap(jax.random.fold_in, (0, None))(base, 0)
    state, ts0 = jax.vmap(env.reset, in_axes=(None, 0))(params, reset_keys)
    carry0 = carry0_fn(num_envs)

    def scan_step(scan_carry, t):
        state, obs, carry = scan_carry
        step_keys = jax.vmap(jax.random.fold_in, (0, None))(base, 1 + t)
        act_key = jax.random.fold_in(base[0], 1 + horizon + t)
        carry, action = policy_fn(carry, obs, act_key, t)
        state, ts = jax.vmap(env.step, in_axes=(None, 0, 0, 0))(
            params, state, action, step_keys)
        traj = Trajectory(obs=obs, action=action, reward=ts.reward,
                          done=ts.done, next_obs=ts.obs, info=ts.info)
        return (state, ts.obs, carry), traj

    (state, _, _), traj = jax.lax.scan(
        scan_step, (state, ts0.obs, carry0), jnp.arange(horizon))
    totals = jnp.sum(traj.reward, axis=0)
    return totals, traj


@partial(jax.jit, static_argnums=(0, 1, 2, 5))
def evaluate_episodes(env: Environment, params, policy_fn: Callable,
                      policy_state, key: jax.Array, num_envs: int):
    """One full fixed-horizon episode per env; returns per-env totals and the
    stacked trajectory (the on-device analogue of the reference's
    ``evaluate_agent`` inner loop, benchmark_newsvendor.py:227-245)."""
    horizon = env.horizon(params)
    reset_key, key = jax.random.split(key)
    state, ts0 = batch_reset(env, params, reset_key, num_envs)

    def scan_step(carry, t):
        state, obs, key = carry
        act_key, step_key, key = jax.random.split(key, 3)
        action = policy_fn(policy_state, obs, act_key, t)
        state, ts = batch_step(env, params, state, action, step_key, num_envs)
        traj = Trajectory(obs=obs, action=action, reward=ts.reward,
                          done=ts.done, next_obs=ts.obs, info=ts.info)
        return (state, ts.obs, key), traj

    (state, _, _), traj = jax.lax.scan(
        scan_step, (state, ts0.obs, key), jnp.arange(horizon))
    totals = jnp.sum(traj.reward, axis=0)
    return totals, traj
