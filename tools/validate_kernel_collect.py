"""Reward-matched validation of the kernel-collection off-policy path.

Trains TD3 and SAC on the IM-backlog env at the same config with both
experience-collection backends —

1. collect='xla'     one fused policy+env step per iteration (validated)
2. collect='kernel'  episode-chunked Pallas collection
                     (OffPolicyConfig(collect="kernel"), round 5)

— and evaluates each with the benchmark protocol (30 deterministic
episodes, seeds 4000+). Both rows use num_envs=1024 (the kernel block
constraint) so the gradient-update : env-step ratio is IDENTICAL by
construction: XLA runs budget/1024 iterations x updates_per_iter
gradient steps; kernel runs budget/(1024*horizon) iterations x
horizon*updates_per_iter. Differences are exactly the chunked data
ordering + on-core exploration. Run on the TPU:
python tools/validate_kernel_collect.py
(results append to tools/remeasure_logs/validate_kernel_collect.jsonl).
"""

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from or_gym_inventory_tpu.utils.compile_cache import \
    enable_persistent_compile_cache

enable_persistent_compile_cache()

from or_gym_inventory_tpu.agents import off_policy as op
from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.vector import vecenv

ALGOS = tuple(os.environ.get("OGT_VC_ALGOS", "td3,sac").split(","))
MODES = tuple(os.environ.get("OGT_VC_MODES", "xla,kernel").split(","))
SEED = int(os.environ.get("OGT_VC_SEED", "0"))
BUDGET = int(os.environ.get("OGT_VC_BUDGET", str(2_000_000)))
# gradient updates per 1024-env iteration: 32 reproduces the benchmark
# roster's 1:32 grad:env ratio (OFF_CFG num_envs=32, 1 update/iter) at
# this batch, the regime whose quality RESULTS.md documents
UPI = int(os.environ.get("OGT_VC_UPI", "32"))
OUT = "tools/remeasure_logs/validate_kernel_collect.jsonl"

PARAMS = im.default_params(backlog=True)


def run_row(algo, mode):
    cfg = op.OffPolicyConfig(algo=algo, collect=mode, num_envs=1024,
                             buffer_size=200_704,  # 1024-divisible, > chunk
                             batch_size=256, updates_per_iter=UPI)
    t0 = time.time()
    state, eval_policy, _ = op.train(
        im.ENV, PARAMS, cfg, jax.random.PRNGKey(SEED), BUDGET,
        log_every=200)
    wall = time.time() - t0
    totals, _ = vecenv.evaluate_episodes_seeded(
        im.ENV, PARAMS, jax.jit(eval_policy),
        (state.actor_params, state.rms),
        jax.numpy.asarray(4000 + np.arange(30)))
    totals = np.asarray(totals)
    row = dict(algo=algo, collect=mode, budget=BUDGET, seed=SEED,
               updates_per_iter=UPI,
               avg_reward=round(float(totals.mean()), 1),
               eval_se=round(float(totals.std(ddof=1) / np.sqrt(30)), 1),
               train_wall_s=round(wall, 1),
               trained_steps_per_s=round(BUDGET / wall))
    print(json.dumps(row), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def main():
    print(json.dumps({"protocol": "IM-backlog default params, eval 30 "
                      "deterministic eps seeds 4000+, num_envs=1024",
                      "backend": jax.default_backend()}), flush=True)
    for algo in ALGOS:
        for mode in MODES:
            run_row(algo, mode)


if __name__ == "__main__":
    main()
