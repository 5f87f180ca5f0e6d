"""Multi-chip / multi-host scaling via jax.sharding + shard_map.

The reference has no parallelism of its own (SURVEY.md §2.5: DummyVecEnv with
n_envs=1; Ray workers only as an optional RLlib path). The TPU-native design
replaces all of it with a single-program device mesh:

- the env batch is sharded along one ``env`` axis; env shards never
  communicate (embarrassingly parallel lockstep batch, all collectives ride
  ICI only for metric reductions via ``psum``);
- the PPO learner runs data-parallel over the same axis, with gradient
  ``psum`` inside the jitted train step (agents/ppo.py);
- multi-host bring-up uses ``jax.distributed.initialize()`` over DCN; all
  steady-state communication is compiled into the program.

Tests emulate an 8-device slice on CPU via
``--xla_force_host_platform_device_count`` (tests/conftest.py).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from or_gym_inventory_tpu.envs.base import Environment
from or_gym_inventory_tpu.vector import vecenv


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (DCN is used only here and for metrics host
    transfer; all steady-state comms compile to ICI collectives)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "env") -> Mesh:
    """1-D mesh over all (or given) devices; the env batch shards along it."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis_name,))


def shard_batch(x, mesh: Mesh, axis_name: str = "env"):
    """Place a batch-leading pytree so its leading axis is sharded over the
    mesh (host->device placement for pre-built batches)."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), x)


def sharded_rollout(env: Environment, params, policy_fn: Callable, policy_state,
                    key: jax.Array, num_envs: int, num_steps: int,
                    mesh: Optional[Mesh] = None, axis_name: str = "env"):
    """``vector.rollout`` sharded over a device mesh.

    ``num_envs`` is the GLOBAL batch; each device runs num_envs/n_devices
    instances with an independently folded key. Returns the time-major
    trajectory (sharded along the env axis) and the psum-reduced total reward
    — the only cross-device communication in the program.
    """
    mesh = mesh or make_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    assert num_envs % n_dev == 0, (num_envs, n_dev)
    local_envs = num_envs // n_dev

    def per_device(key):
        key = jax.random.fold_in(key[0], jax.lax.axis_index(axis_name))
        carry, traj = vecenv.rollout(
            env, params, policy_fn, policy_state, key, local_envs, num_steps)
        total = jax.lax.psum(jnp.sum(traj.reward), axis_name)
        return traj, total

    # A single spec is a pytree prefix: every Trajectory leaf is time-major
    # (T, env, ...), sharded on its second axis.
    fn = jax.shard_map(per_device, mesh=mesh, in_specs=P(axis_name),
                       out_specs=(P(None, axis_name), P()), check_vma=False)
    keys = jax.random.split(key, n_dev)
    return jax.jit(fn)(keys)


def sharded_evaluate(env: Environment, params, policy_fn: Callable,
                     policy_state, key: jax.Array, num_envs: int,
                     mesh: Optional[Mesh] = None, axis_name: str = "env"):
    """One fixed-horizon episode per env, sharded; returns (per-env totals
    gathered along the env axis, global mean reward scalar)."""
    mesh = mesh or make_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    assert num_envs % n_dev == 0, (num_envs, n_dev)
    local_envs = num_envs // n_dev

    def per_device(key):
        key = jax.random.fold_in(key[0], jax.lax.axis_index(axis_name))
        totals, _ = vecenv.evaluate_episodes(
            env, params, policy_fn, policy_state, key, local_envs)
        mean = jax.lax.pmean(jnp.mean(totals), axis_name)
        return totals, mean

    fn = jax.shard_map(per_device, mesh=mesh, in_specs=P(axis_name),
                       out_specs=(P(axis_name), P()), check_vma=False)
    keys = jax.random.split(key, n_dev)
    totals, mean = jax.jit(fn)(keys)
    return totals, mean


def sharded_random_episode_returns(params, key: jax.Array, num_envs: int,
                                   mesh: Optional[Mesh] = None,
                                   axis_name: str = "env", block: int = 1024,
                                   use_pallas: bool = True,
                                   episodes_per_lane: int = 1):
    """``vector.random_episode_returns`` sharded over a device mesh — the
    multi-chip form of the headline fused-episode-kernel workload.

    ``num_envs`` is the GLOBAL lane count; each device runs
    num_envs/n_devices lanes through its family's fused whole-episode
    Pallas kernel (XLA fallback off-TPU) with an independently folded key.
    Env shards never communicate — the only collective is a ``pmean`` of
    the per-shard mean return (a scalar sanity statistic), so throughput
    scales linearly with chips over ICI. Returns (per-episode returns
    gathered along the env axis, shape (episodes_per_lane * num_envs,);
    global mean scalar).
    """
    from or_gym_inventory_tpu.vector.fast_episodes import \
        random_episode_returns
    mesh = mesh or make_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    assert num_envs % n_dev == 0, (num_envs, n_dev)
    local = num_envs // n_dev
    # The fused episode kernels require local % block == 0 with block a
    # multiple of 1024 (native (8, 128) f32 tiles). Fix the block up front —
    # largest valid divisor of the PER-DEVICE lane count — rather than
    # letting the kernel assert fire on a real mesh; with no valid block
    # (local not a multiple of 1024) take the XLA rollout path instead.
    if use_pallas:
        # clamp UP to 1024 first (matching the single-device dispatcher's
        # max(block, 1024)) so a small requested block doesn't round to 0
        # and silently drop the kernel path for a perfectly valid mesh
        start = min(max(block, 1024), local) // 1024 * 1024
        fixed = next((b for b in range(start, 0, -1024) if local % b == 0),
                     None)
        if fixed is None:
            use_pallas = False
        else:
            block = fixed

    def per_device(key):
        key = jax.random.fold_in(key[0], jax.lax.axis_index(axis_name))
        rets = random_episode_returns(params, key, local, block=block,
                                      use_pallas=use_pallas,
                                      episodes_per_lane=episodes_per_lane)
        return rets, jax.lax.pmean(jnp.mean(rets), axis_name)

    fn = jax.shard_map(per_device, mesh=mesh, in_specs=P(axis_name),
                       out_specs=(P(axis_name), P()), check_vma=False)
    keys = jax.random.split(key, n_dev)
    return jax.jit(fn)(keys)


def sharded_policy_episode_returns(params, actor, key: jax.Array,
                                   num_envs: int, mesh: Optional[Mesh] = None,
                                   axis_name: str = "env", block: int = 1024,
                                   use_pallas: bool = True,
                                   episodes_per_lane: int = 1):
    """``vector.policy_episode_returns`` sharded over a device mesh — the
    multi-chip form of the policy-in-kernel learned-policy evaluation.

    ``actor`` (folded weights) is replicated to every device; each device
    evaluates num_envs/n_devices independent episodes through its family's
    policy kernel (XLA fallback off-TPU). Same communication shape as
    :func:`sharded_random_episode_returns` — the only collective is the
    pmean sanity scalar, so throughput scales linearly over ICI.
    """
    from or_gym_inventory_tpu.vector.fast_episodes import \
        policy_episode_returns
    mesh = mesh or make_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    assert num_envs % n_dev == 0, (num_envs, n_dev)
    local = num_envs // n_dev
    if use_pallas:
        start = min(max(block, 1024), local) // 1024 * 1024
        fixed = next((b for b in range(start, 0, -1024) if local % b == 0),
                     None)
        if fixed is None:
            use_pallas = False
        else:
            block = fixed

    def per_device(actor, key):
        key = jax.random.fold_in(key[0], jax.lax.axis_index(axis_name))
        rets = policy_episode_returns(params, actor, key, local, block=block,
                                      use_pallas=use_pallas,
                                      episodes_per_lane=episodes_per_lane)
        return rets, jax.lax.pmean(jnp.mean(rets), axis_name)

    fn = jax.shard_map(per_device, mesh=mesh, in_specs=(P(), P(axis_name)),
                       out_specs=(P(axis_name), P()), check_vma=False)
    keys = jax.random.split(key, n_dev)
    return jax.jit(fn)(actor, keys)
