"""Throughput sweep: vectorized env-steps/s per family vs batch size.

Prints one JSON line per (env, batch) with steps/s and per-step time —
used to locate the launch-bound -> bandwidth-bound transition and to fill
PERFORMANCE.md. Run on the accelerator: ``python benchmarks/throughput.py``.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.envs import newsvendor as nv
from or_gym_inventory_tpu.envs import topology as topo
from or_gym_inventory_tpu.vector import vecenv

CASES = [
    ("newsvendor", nv.ENV, nv.default_params(), 40),
    ("inv_mgmt", im.ENV, im.default_params(), 30),
    ("net_inv_default", net.ENV, net.default_params(), 30),
    ("net_inv_custom", net.ENV,
     net.default_params(topology=topo.custom_topology(30)), 30),
]

BATCHES = [1024, 8192, 65536, 262144]


def main():
    for name, env, params, steps in CASES:
        space = env.action_space(params)
        policy = lambda _s, obs, key, t: space.sample(key, (obs.shape[0],))
        for batch in BATCHES:
            f = jax.jit(lambda key, n=batch: vecenv.rollout(
                env, params, policy, None, key, n, steps)[1].reward.sum())
            try:
                # host fetch, not block_until_ready: the axon-relayed backend's
                # block was observed to return before execution completes
                float(f(jax.random.PRNGKey(0)))
                times = []
                for i in range(3):
                    t0 = time.perf_counter()
                    float(f(jax.random.PRNGKey(i)))
                    times.append(time.perf_counter() - t0)
                best = min(times)
                print(json.dumps({
                    "env": name, "batch": batch, "steps": steps,
                    "steps_per_s": round(batch * steps / best),
                    "us_per_scan_iter": round(best / steps * 1e6, 1)}),
                    flush=True)
            except Exception as e:
                print(json.dumps({"env": name, "batch": batch,
                                  "error": str(e)[:100]}), flush=True)


if __name__ == "__main__":
    main()
