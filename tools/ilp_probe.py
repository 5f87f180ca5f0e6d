"""ILP probe: does interleaving independent episodes per lane-group break
the fused NetInvMgmt kernel's dependency-chain ceiling?

PERFORMANCE.md's utilization arithmetic estimates the fused episode kernel
at ~20-25% of VPU peak and attributes the gap to the serial dependency chain
inside each period (the 11-link sequential contention is serial by reference
semantics). If that story is right, simulating E INDEPENDENT episodes in the
same kernel (E separate state sets, interleaved op streams, E x the useful
work per launch) should scale throughput toward E x until the VPU issue rate
saturates; if the kernel is actually issue- or memory-bound, E will not
help. Either outcome resolves VERDICT round-2 weak #3 with data.

Run (TPU): python tools/ilp_probe.py          -> one JSON line per (E, block)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.ops import pallas_net_step as pns

BATCH = int(os.environ.get("OGT_BATCH", 1_048_576))
NUM_STEPS = 30


def episode_returns_multi(params, seed, act_hi, batch, n_episodes,
                          block=2048):
    out = pns.episode_returns_fully_fused(
        params, seed, act_hi, batch, num_steps=NUM_STEPS, block=block,
        episodes_per_lane=n_episodes)
    return out.reshape(n_episodes, batch) if n_episodes > 1 else out[None]


def _time(f, n=3):
    float(f(jax.random.PRNGKey(0)))  # compile; host fetch = real sync
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(f(jax.random.PRNGKey(i + 1)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    params = net.default_params(num_periods=NUM_STEPS)
    hi = float(params.topology.order_cap_heuristic * 2)
    baseline = None
    import os as _os
    for E in tuple(int(x) for x in _os.environ.get("OGT_E", "1,2,4").split(",")):
        for block in (1024, 2048):
            @jax.jit
            def run(key, E=E, block=block):
                seed = jax.random.randint(key, (), 0, 2**31 - 1)
                return episode_returns_multi(params, seed, hi, BATCH, E,
                                             block=block).sum()
            try:
                best = _time(run)
                sps = round(E * BATCH * NUM_STEPS / best)
                row = {"episodes_per_lane": E, "block": block,
                       "batch": BATCH, "time_s": round(best, 4),
                       "steps_per_s": sps}
                if E == 1 and block == 2048:
                    baseline = sps
                if baseline:
                    row["vs_E1"] = round(sps / baseline, 3)
                print(json.dumps(row), flush=True)
            except Exception as e:
                print(json.dumps({"episodes_per_lane": E, "block": block,
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
