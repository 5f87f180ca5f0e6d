"""Headline benchmark: aggregate vectorized env-step throughput.

Runs the hardest reference environment (NetInvMgmt default 9-node graph —
reference measured at ~78 steps/s single env, pandas loops:
network_management.py:436-635) under a uniform-random policy and prints ONE
JSON line:

    {"metric": ..., "value": N, "unit": "env_steps_per_s", "vs_baseline": N}

vs_baseline is against the measured reference throughput (BASELINE.md).

Fast path: the whole-episode Pallas kernel (state VMEM-resident across all
30 periods, actions sampled in-kernel by the TPU hardware PRNG; semantics
pinned bit-exact vs the XLA step chain by tests/test_pallas_*.py, measured
head-to-head in benchmarks/pallas_episode.py). Falls back to the XLA
vmap+scan rollout when the kernel path is unavailable (e.g. CPU backend).
"""

import json
import time

import jax
import jax.numpy as jnp

from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.vector import vecenv

REFERENCE_STEPS_PER_S = 78.0  # BASELINE.md: NetInvMgmtBacklogEnv, 2-vCPU host

NUM_ENVS_PALLAS = 1_048_576
NUM_ENVS_XLA = 262_144
NUM_STEPS = 30


def _time(run, n=5):
    # NOTE: timing forces a host fetch of the result (float(...)) rather than
    # relying on block_until_ready — on the axon-relayed TPU backend
    # block_until_ready was observed to return before execution completes,
    # which silently measures dispatch rather than compute.
    float(run(jax.random.PRNGKey(0)))  # compile
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        float(run(jax.random.PRNGKey(i + 1)))
        times.append(time.perf_counter() - t0)
    return min(times)


def _pallas_path(params):
    from or_gym_inventory_tpu.ops import pallas_net_step as pk
    T = params.topology
    hi = float(T.order_cap_heuristic * 2)  # action_space high
    lam = jnp.asarray([s[1] if s[0] == "poisson" else 0.0
                       for s in T.rt_demand], jnp.float32)

    @jax.jit
    def run(key):
        dkey, skey = jax.random.split(key)
        dems = jax.random.poisson(
            dkey, lam[None, :, None],
            (NUM_STEPS, T.n_retail, NUM_ENVS_PALLAS)).astype(jnp.float32)
        seed = jax.random.randint(skey, (), 0, 2**31 - 1)
        return pk.episode_returns_random_policy(
            params, dems, seed, hi, block=1024).sum()

    return _time(run), NUM_ENVS_PALLAS


def _xla_path(params):
    space = net.ENV.action_space(params)

    def policy(_state, obs, key, _t):
        return space.sample(key, (obs.shape[0],))

    @jax.jit
    def run(key):
        _, traj = vecenv.rollout(net.ENV, params, policy, None, key,
                                 NUM_ENVS_XLA, NUM_STEPS)
        return jnp.sum(traj.reward)

    return _time(run), NUM_ENVS_XLA


def main():
    params = net.default_params(num_periods=NUM_STEPS)
    try:
        best, num_envs = _pallas_path(params)
    except Exception:
        best, num_envs = _xla_path(params)
    steps_per_s = num_envs * NUM_STEPS / best
    print(json.dumps({
        "metric": "net_inv_mgmt_vectorized_env_steps_per_s",
        "value": round(steps_per_s),
        "unit": "env_steps_per_s",
        "vs_baseline": round(steps_per_s / REFERENCE_STEPS_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
