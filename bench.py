"""Headline benchmark: aggregate vectorized env-step throughput.

Runs the hardest reference environment (NetInvMgmt default 9-node graph —
reference measured at ~78 steps/s single env, pandas loops:
network_management.py:436-635) as a vmapped batch under one jitted
lax.scan rollout on the available accelerator, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "env_steps_per_s", "vs_baseline": N}

vs_baseline is against the measured reference throughput (BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp

from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.vector import vecenv

REFERENCE_STEPS_PER_S = 78.0  # BASELINE.md: NetInvMgmtBacklogEnv, 2-vCPU host

NUM_ENVS = 262144
NUM_STEPS = 30


def main():
    params = net.default_params(num_periods=NUM_STEPS)
    space = net.ENV.action_space(params)

    def policy(_state, obs, key, _t):
        return space.sample(key, (obs.shape[0],))

    @jax.jit
    def run(key):
        _, traj = vecenv.rollout(net.ENV, params, policy, None, key,
                                 NUM_ENVS, NUM_STEPS)
        return jnp.sum(traj.reward)

    # NOTE: timing forces a host fetch of the result (float(...)) rather than
    # relying on block_until_ready — on the axon-relayed TPU backend
    # block_until_ready was observed to return before execution completes,
    # which silently measures dispatch rather than compute.
    float(run(jax.random.PRNGKey(0)))  # compile
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        float(run(jax.random.PRNGKey(i + 1)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    steps_per_s = NUM_ENVS * NUM_STEPS / best
    print(json.dumps({
        "metric": "net_inv_mgmt_vectorized_env_steps_per_s",
        "value": round(steps_per_s),
        "unit": "env_steps_per_s",
        "vs_baseline": round(steps_per_s / REFERENCE_STEPS_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
