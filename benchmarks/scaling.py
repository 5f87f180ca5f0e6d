"""Weak-scaling efficiency of the sharded rollout across a device mesh.

Runs the same per-device workload on 1, 2, 4, ... devices and reports
aggregate env-steps/s and efficiency vs linear scaling. Env shards never
communicate, so efficiency should be ~100% minus launch/psum overhead —
this validates the shard_map program structure (on real multi-chip hardware
the same program rides ICI).

Run on a virtual mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scaling.py
"""

import json
import sys
import time

import jax

sys.path.insert(0, ".")

from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.parallel import mesh as pmesh

ENVS_PER_DEVICE = 2048
NUM_STEPS = 30


def main():
    devices = jax.devices()
    params = net.default_params(num_periods=NUM_STEPS)
    space = net.ENV.action_space(params)
    policy = lambda _s, obs, key, t: space.sample(key, (obs.shape[0],))

    results = []
    n = 1
    while n <= len(devices):
        mesh = pmesh.make_mesh(devices[:n])
        num_envs = ENVS_PER_DEVICE * n

        def run(key):
            traj, total = pmesh.sharded_rollout(
                net.ENV, params, policy, None, key, num_envs, NUM_STEPS,
                mesh=mesh)
            return total

        key = jax.random.PRNGKey(0)
        jax.block_until_ready(run(key))
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jax.random.PRNGKey(i)))
            times.append(time.perf_counter() - t0)
        sps = num_envs * NUM_STEPS / min(times)
        results.append({"devices": n, "envs": num_envs,
                        "steps_per_s": round(sps)})
        n *= 2

    base = results[0]["steps_per_s"]
    for r in results:
        r["efficiency_vs_linear"] = round(
            r["steps_per_s"] / (base * r["devices"]), 3)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
