"""Map the reset-fused Newsvendor kernel's interleave saturation curve
(same experiment as tools/ilp_probe.py / tools/im_interleave_probe.py ran
for the other two families): E independent episodes per lane, each drawing
its own econ + demand on-core.

Prints one JSON line per (E, lanes, block): effective env-steps/s =
lanes*E*step_limit per launch over best-of-4 host-fetch-timed runs.

Run on the TPU: python tools/nv_interleave_probe.py
"""

import json
import os
import sys
import time

import jax

sys.path.insert(0, ".")

from or_gym_inventory_tpu.envs import newsvendor as nv
from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek


def time_fn(f, n=4):
    float(f(0))  # compile; host fetch forces sync (PERFORMANCE.md note)
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(f(i + 1))
        ts.append(time.perf_counter() - t0)
    return min(ts)


E_LIST = tuple(int(x) for x in os.environ.get("OGT_E", "1,2,4,8").split(","))
LANES = tuple(int(x) for x in os.environ.get(
    "OGT_LANES", str(1 << 20) + "," + str(1 << 22)).split(","))
BLOCKS = tuple(int(x) for x in os.environ.get("OGT_BLOCKS",
                                              "1024,2048").split(","))


def main():
    p = nv.default_params()
    for lanes in LANES:
        for E in E_LIST:
            for block in BLOCKS:
                fn = jax.jit(lambda s, E=E, lanes=lanes, block=block:
                             pek.episode_returns_nv_reset_fused(
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
                    "eff_steps_per_s": round(lanes * E * p.step_limit / best),
                }), flush=True)


if __name__ == "__main__":
    main()
