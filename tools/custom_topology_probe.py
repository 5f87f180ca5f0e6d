"""Measure the custom 7-node topology (network_management_custom.py:108-139)
through the fully-fused episode kernel — the topology is baked at trace
time, so the same kernel covers it; this records the number PERFORMANCE.md
cites (previously the custom topology appeared only in the XLA table).

Also cross-checks the fused kernel against the pre-materialized kernel and
the XLA step chain on dumped streams before timing (bench.py discipline).

Run on the TPU: python tools/custom_topology_probe.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.envs import topology as topo
from or_gym_inventory_tpu.ops import pallas_net_step as pns

E_LIST = tuple(int(x) for x in os.environ.get("OGT_E", "1,4,8").split(","))
LANES = int(os.environ.get("OGT_LANES", str(1 << 22)))
BLOCK = int(os.environ.get("OGT_BLOCKS", "1024"))
PERIODS = int(os.environ.get("OGT_PERIODS", "30"))


def time_fn(f, n=4):
    float(f(0))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(f(i + 1))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def crosscheck(params, hi):
    seed = jnp.asarray(77, jnp.int32)
    B = 1024
    acts, dems = pns.sample_streams_debug(params, seed, hi, B, block=1024)
    fused = np.asarray(pns.episode_returns_fully_fused(params, seed, hi, B,
                                                       block=1024))
    pre = np.asarray(pns.episode_returns(params, acts, dems, block=512))
    assert np.allclose(fused, pre, rtol=1e-5, atol=1e-3), \
        float(np.abs(fused - pre).max())

    @jax.jit
    def xla_ret(actions, demands):
        def one_env(a, d):
            state, _ = net.reset(params)

            def body(state, ad):
                state, ts = net.step_with_demand(params, state, *ad)
                return state, ts.reward

            _, rew = jax.lax.scan(body, state, (a, d))
            return jnp.sum(rew)

        return jax.vmap(one_env, in_axes=(2, 2))(actions, demands)

    x = np.asarray(xla_ret(acts, dems))
    assert np.allclose(pre, x, rtol=1e-4, atol=1e-2), \
        float(np.abs(pre - x).max())
    print(json.dumps({"crosscheck": "ok", "envs": B}), flush=True)


def main():
    params = net.default_params(topology=topo.custom_topology(PERIODS),
                                num_periods=PERIODS)
    T = params.topology
    hi = float(T.order_cap_heuristic * 2)
    print(json.dumps({"topology": "custom7", "n_main": T.n_main,
                      "n_reorder": T.n_reorder, "n_retail": T.n_retail,
                      "periods": PERIODS, "lanes": LANES,
                      "block": BLOCK}), flush=True)
    crosscheck(params, hi)
    for E in E_LIST:
        fn = jax.jit(lambda s, E=E: pns.episode_returns_fully_fused(
            params, s, hi, LANES, block=BLOCK, episodes_per_lane=E).sum())
        try:
            best = time_fn(fn)
        except Exception as e:
            print(json.dumps({"E": E, "error": str(e)[:160]}), flush=True)
            continue
        print(json.dumps({
            "E": E, "time_ms": round(best * 1e3, 2),
            "eff_steps_per_s": round(LANES * E * PERIODS / best),
        }), flush=True)


if __name__ == "__main__":
    main()
