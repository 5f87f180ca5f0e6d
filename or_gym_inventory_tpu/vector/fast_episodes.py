"""Fastest rollout path: whole-episode returns for a lockstep batch.

One public function dispatches each env family to its FULLY-FUSED
whole-episode Pallas kernel (state VMEM-resident across the full static
horizon; actions, demand, and — for newsvendor — the reset economics all
sampled in-kernel by the TPU hardware PRNG; throughput numbers in
PERFORMANCE.md) and falls back to the XLA rollout on backends without
Pallas TPU support, so callers get one API everywhere.

This is the random-policy evaluation workload (the reference's RandomAgent
benchmark protocol and bench.py's headline). Policy-driven rollouts still go
through vector.rollout — a learned policy needs the obs stream, which the
returns-only kernels deliberately never materialize.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.envs import newsvendor as nv
from or_gym_inventory_tpu.vector import vecenv


def _xla_fallback(env, params, key, batch, num_steps, discount):
    space = env.action_space(params)

    def policy(_s, obs, k, _t):
        return space.sample(k, (obs.shape[0],))

    _, traj = vecenv.rollout(env, params, policy, None, key, batch, num_steps)
    if discount == 1.0:
        return jnp.sum(traj.reward, axis=0)
    w = discount ** jnp.arange(num_steps, dtype=jnp.float32)
    return jnp.sum(w[:, None] * traj.reward, axis=0)


def random_episode_returns(params, key: jax.Array, batch: int,
                           block: int = 1024, use_pallas: bool = True,
                           episodes_per_lane: int = 1):
    """Per-episode (discounted) returns under the uniform-random policy.

    ``params`` selects the family (NewsvendorParams / InvManagementParams /
    NetInvParams). Returns a (episodes_per_lane * batch,) float32 array of
    episode returns ((batch,) at the default episodes_per_lane=1).
    ``use_pallas=False`` forces the XLA rollout (also used automatically
    when the kernel path fails to lower, e.g. on CPU).

    ``episodes_per_lane`` multiplies the episodes simulated per call.
    Episodes are mutually independent in every family, so this is purely a
    performance knob: on the fused Pallas kernels it interleaves that many
    independent episodes per VPU lane (pipelining around each family's
    serial dependency chains — PERFORMANCE.md "the ILP ceiling measured,
    then broken"); on the XLA fallback it simply widens the batch. Element
    ORDERING of the returned array is unspecified and backend-dependent
    (the Pallas path is episode-major, the fallback a widened batch);
    episodes are i.i.d., so only the multiset of returns is meaningful —
    don't pair elements by index across backends.
    """
    E = int(episodes_per_lane)
    if E < 1:
        raise ValueError(f"episodes_per_lane must be >= 1, got {E}")
    if isinstance(params, nv.NewsvendorParams):
        def pallas_path():
            # reset-fused: econ, actions AND dynamic-mu Poisson demand all
            # sampled on-core (per-lane running-pmf CDF inversion)
            from or_gym_inventory_tpu.ops.pallas_episode_kernels import \
                episode_returns_nv_reset_fused
            seed = jax.random.randint(key, (), 0, 2**31 - 1)
            return episode_returns_nv_reset_fused(
                params, seed, batch, block=max(block, 1024),
                episodes_per_lane=E).reshape(-1)

        xla = lambda: _xla_fallback(nv.ENV, params, key, E * batch,
                                    params.step_limit, params.gamma)
    elif isinstance(params, im.InvManagementParams):
        def pallas_path():
            # fully-fused: actions AND demand sampled on-core (exact CDF
            # inversion for all four stochastic dist modes; USER baked as
            # per-period constants)
            from or_gym_inventory_tpu.ops.pallas_episode_kernels import \
                episode_returns_im_fused
            seed = jax.random.randint(key, (), 0, 2**31 - 1)
            return episode_returns_im_fused(params, seed, batch,
                                            block=max(block, 1024),
                                            episodes_per_lane=E).reshape(-1)

        # step rewards are already alpha^t-discounted (reference semantics)
        xla = lambda: _xla_fallback(im.ENV, params, key, E * batch,
                                    params.periods, 1.0)
    elif isinstance(params, net.NetInvParams):
        def pallas_path():
            # fully-fused: actions AND Poisson demand sampled on-core via
            # compile-time CDF inversion (raises NotImplementedError for
            # non-Poisson links, handled below)
            from or_gym_inventory_tpu.ops.pallas_net_step import \
                episode_returns_fully_fused
            T = params.topology
            seed = jax.random.randint(key, (), 0, 2**31 - 1)
            hi = float(T.order_cap_heuristic * 2)
            return episode_returns_fully_fused(
                params, seed, hi, batch, block=max(block, 1024),
                episodes_per_lane=E).reshape(-1)

        xla = lambda: _xla_fallback(net.ENV, params, key, E * batch,
                                    params.num_periods, 1.0)
    else:
        raise TypeError(f"Unknown params type {type(params).__name__}")

    if use_pallas and jax.default_backend() == "tpu":
        try:
            return pallas_path()
        except NotImplementedError as e:
            # expected unavailability (e.g. non-Poisson demand spec): fall
            # back, but say so — any other exception is a genuine kernel bug
            # and must propagate rather than silently change the numbers
            warnings.warn(f"Pallas episode-kernel path unavailable ({e}); "
                          "falling back to the XLA rollout", RuntimeWarning)
    return xla()


def policy_episode_returns(params, actor, key: jax.Array, batch: int,
                           block: int = 1024, use_pallas: bool = True,
                           episodes_per_lane: int = 1,
                           deterministic: bool = True, log_std=None):
    """Per-episode returns under a learned MLP policy.

    ``actor`` is ``(Ws, bs)`` from ``ops.pallas_episode_kernels.
    fold_actor_params`` (pi trunk + mean head as plain f32 arrays, obs
    normalization pre-folded — build it from a PPO/A2C train state). On
    TPU every family runs its policy-in-kernel evaluator (the MLP fused
    into the episode kernel as MXU matmuls — measured 39-187x the XLA
    rollout, PERFORMANCE.md round 4; the network env falls back loudly
    for hostfn demand links); other backends run the same policy through
    the XLA vmap rollout. Episode ordering caveats are as in
    :func:`random_episode_returns`.

    ``deterministic=False`` evaluates the STOCHASTIC policy — actions are
    tanh-squashed Gaussian samples around the actor mean, SB3
    ``predict(deterministic=False)`` semantics
    (benchmark_InvManagementBacklogEnv.py:332-342). Requires ``log_std``
    (the trained per-action-dim parameter, e.g.
    ``train_state.params["params"]["log_std"]``); on TPU the noise comes
    from the in-kernel Box-Muller sampler, on the fallback from
    ``networks.gaussian_sample`` — same distribution, different streams.
    """
    E = int(episodes_per_lane)
    if E < 1:
        raise ValueError(f"episodes_per_lane must be >= 1, got {E}")
    if not deterministic and log_std is None:
        raise ValueError("deterministic=False requires log_std (the "
                         "trained per-action-dim log-std parameter)")
    kern_log_std = None if deterministic else log_std
    env = (nv.ENV if isinstance(params, nv.NewsvendorParams)
           else im.ENV if isinstance(params, im.InvManagementParams)
           else net.ENV if isinstance(params, net.NetInvParams) else None)
    if env is None:
        raise TypeError(f"Unknown params type {type(params).__name__}")

    def xla():
        import numpy as np

        from or_gym_inventory_tpu.agents import networks
        from or_gym_inventory_tpu.ops.pallas_episode_kernels import (
            apply_folded_actor, clipped_std, folded_actor_mean)
        space = env.action_space(params)
        low = jnp.asarray(space.low, jnp.float32)
        high = jnp.asarray(np.where(np.isinf(space.high), 1e4, space.high),
                           jnp.float32)
        int_actions = np.issubdtype(space.dtype, np.integer)
        std = None if deterministic else clipped_std(log_std).reshape(-1)

        def policy(_s, obs, k, _t):
            if deterministic:
                return apply_folded_actor(actor, obs, low, high, int_actions)
            H = folded_actor_mean(actor, obs)
            raw = H + std * jax.random.normal(k, H.shape)
            a = networks.squash_action(raw, low, high)
            return a.astype(jnp.int32) if int_actions else a

        _, traj = vecenv.rollout(env, params, policy, None, key, E * batch,
                                 env.horizon(params))
        # newsvendor step rewards are UNdiscounted (the kernels and the
        # reference accumulate gamma**t); IM/net discount in-step
        if isinstance(params, nv.NewsvendorParams) and params.gamma != 1.0:
            w = params.gamma ** jnp.arange(params.step_limit,
                                           dtype=jnp.float32)
            return jnp.sum(w[:, None] * traj.reward, axis=0)
        return jnp.sum(traj.reward, axis=0)

    if use_pallas and jax.default_backend() == "tpu":
        if isinstance(params, im.InvManagementParams):
            from or_gym_inventory_tpu.ops.pallas_episode_kernels import \
                episode_returns_im_policy as kern
        elif isinstance(params, nv.NewsvendorParams):
            from or_gym_inventory_tpu.ops.pallas_episode_kernels import \
                episode_returns_nv_policy as kern
        else:
            from or_gym_inventory_tpu.ops.pallas_net_step import \
                episode_returns_net_policy as kern
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        try:
            # every family takes the same loud fallback on expected kernel
            # unavailability (e.g. hostfn demand links or a demand support
            # beyond the inversion-table cap); any other exception is a
            # genuine kernel bug and propagates
            return kern(params, actor, seed, batch, block=max(block, 1024),
                        episodes_per_lane=E,
                        log_std=kern_log_std).reshape(-1)
        except NotImplementedError as e:
            warnings.warn(f"policy kernel unavailable ({e}); falling "
                          "back to the XLA rollout", RuntimeWarning)
    return xla()


def lstm_policy_episode_returns(params, actor, key: jax.Array, batch: int,
                                block: int = 1024, use_pallas: bool = True):
    """Per-episode returns under a DETERMINISTIC learned LSTM policy.

    ``actor`` is the dict from ``ops.pallas_episode_kernels.
    fold_lstm_actor`` (encoder + gate blocks + mean head as plain f32
    arrays, obs normalization pre-folded — build it from a RecurrentPPO /
    A2C_LSTM train state). On TPU the InvManagement family runs the
    LSTM-policy-in-kernel evaluator (the recurrent cell as two MXU
    matmuls with the (hidden, lanes) carry VMEM-resident —
    episode_returns_im_lstm); every other case runs the same folded math
    through an XLA scan with the carry threaded. Episode ordering caveats
    are as in :func:`random_episode_returns`."""
    env = (nv.ENV if isinstance(params, nv.NewsvendorParams)
           else im.ENV if isinstance(params, im.InvManagementParams)
           else net.ENV if isinstance(params, net.NetInvParams) else None)
    if env is None:
        raise TypeError(f"Unknown params type {type(params).__name__}")
    if use_pallas and jax.default_backend() == "tpu" and \
            isinstance(params, im.InvManagementParams):
        from or_gym_inventory_tpu.ops.pallas_episode_kernels import \
            episode_returns_im_lstm
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        try:
            return episode_returns_im_lstm(params, actor, seed, batch,
                                           block=max(block, 1024))
        except NotImplementedError as e:
            warnings.warn(f"LSTM policy kernel unavailable ({e}); falling "
                          "back to the XLA rollout", RuntimeWarning)

    # XLA fallback: the folded math verbatim, carry threaded by the scan
    import numpy as np
    space = env.action_space(params)
    low = jnp.asarray(space.low, jnp.float32)
    high = jnp.asarray(np.where(np.isinf(space.high), 1e4, space.high),
                       jnp.float32)
    int_actions = np.issubdtype(space.dtype, np.integer)
    hidden = actor["wh"].shape[1]
    horizon = env.horizon(params)

    @jax.jit
    def run(key):
        rkey, key = jax.random.split(key)
        state, ts0 = vecenv.batch_reset(env, params, rkey, batch)

        def body(carry, _):
            state, obs, H, C, key = carry
            skey, key = jax.random.split(key)
            X = obs.astype(jnp.float32)
            for W, b in actor["enc"]:          # (out, in) layout
                X = jnp.tanh(X @ W.T + b.T)
            G = X @ actor["wx"].T + H @ actor["wh"].T + actor["bh"].T
            i = jax.nn.sigmoid(G[:, :hidden])
            f = jax.nn.sigmoid(G[:, hidden:2 * hidden])
            g = jnp.tanh(G[:, 2 * hidden:3 * hidden])
            o = jax.nn.sigmoid(G[:, 3 * hidden:])
            C = f * C + i * g
            H = o * jnp.tanh(C)
            mean = H @ actor["wm"].T + actor["bm"].T
            from or_gym_inventory_tpu.agents import networks
            a = networks.squash_action(mean, low, high)
            a = a.astype(jnp.int32) if int_actions else a
            state, ts = vecenv.batch_step(env, params, state, a, skey, batch)
            return (state, ts.obs, H, C, key), ts.reward

        z = jnp.zeros((batch, hidden), jnp.float32)
        (_, _, _, _, _), rew = jax.lax.scan(
            body, (state, ts0.obs, z, z, key), None, length=horizon)
        # newsvendor step rewards are UNdiscounted (kernels/reference
        # accumulate gamma**t); IM/net discount in-step
        if isinstance(params, nv.NewsvendorParams) and params.gamma != 1.0:
            w = params.gamma ** jnp.arange(horizon, dtype=jnp.float32)
            return jnp.sum(w[:, None] * rew, axis=0)
        return jnp.sum(rew, axis=0)

    return run(key)

