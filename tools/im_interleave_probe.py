"""Measure the episodes-per-lane interleave on the fully-fused
InvManagement episode kernel (same experiment as tools/ilp_probe.py ran for
NetInvMgmt — E independent dependency chains per lane pipeline around the
serial per-period event chain).

Prints one JSON line per (E, lanes): effective env-steps/s = lanes*E*periods
per launch over best-of-4 host-fetch-timed runs.

Run on the TPU: python tools/im_interleave_probe.py
"""

import json
import sys
import time

import jax

sys.path.insert(0, ".")

from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek


def time_fn(f, n=4):
    float(f(0))  # compile; host fetch forces sync (PERFORMANCE.md note)
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(f(i + 1))
        ts.append(time.perf_counter() - t0)
    return min(ts)


E_LIST = tuple(int(x) for x in __import__("os").environ.get("OGT_E", "1,2,4").split(","))


def main():
    p = im.default_params()
    for lanes in (1 << 20, 1 << 22):
        for E in E_LIST:
            for block in (1024, 2048):
                fn = jax.jit(lambda s, E=E, lanes=lanes, block=block:
                             pek.episode_returns_im_fused(
                                 p, s, lanes, block=block,
                                 episodes_per_lane=E).sum())
                try:
                    best = time_fn(fn)
                except Exception as e:
                    print(json.dumps({"E": E, "lanes": lanes, "block": block,
                                      "error": str(e)[:160]}), flush=True)
                    continue
                print(json.dumps({
                    "E": E, "lanes": lanes, "block": block,
                    "time_ms": round(best * 1e3, 2),
                    "eff_steps_per_s": round(lanes * E * p.periods / best),
                }), flush=True)


if __name__ == "__main__":
    main()
