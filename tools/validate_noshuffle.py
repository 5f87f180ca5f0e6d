"""Reward-parity validation of the env-sliced PPO minibatch recipe.

The round-4 `shuffle_minibatches=False` recipe (env-sliced minibatches
built once per update) is 3.8x faster at TPU-native batch
(PERFORMANCE.md) but was argued unbiased, not demonstrated. This script
demonstrates it at the IM-backlog benchmark protocol
(benchmarks/benchmark_inv_management_backlog.py: periods=50, eval 30
episodes seeded 4000+, the roster PPO config):

1. shuffled @ protocol batch (256 envs, 2M steps)   — the RESULTS.md row
2. env-sliced @ protocol batch (only the recipe toggled)
3. shuffled vs env-sliced @ TPU-native batch (65,536 envs, matched
   budget) — the regime where the auto-default (PPOConfig.
   shuffle_minibatches=None with NOSHUFFLE_ENVS_THRESHOLD) picks
   env-sliced

and reports AvgReward +- the eval standard error for each, plus wall
times. Run on the TPU: python tools/validate_noshuffle.py
(env knobs: OGT_VN_ROWS=1,2,3 to restrict; results append to
tools/remeasure_logs/validate_noshuffle.jsonl).
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

from or_gym_inventory_tpu.agents import ppo
from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.vector import vecenv

ROWS = tuple(os.environ.get("OGT_VN_ROWS", "1,2,3").split(","))
SEED = int(os.environ.get("OGT_VN_SEED", "0"))
OUT = "tools/remeasure_logs/validate_noshuffle.jsonl"

PARAMS = im.default_params(backlog=True, periods=50)
BASE = ppo.PPOConfig(num_envs=256, rollout_steps=50, num_minibatches=8,
                     update_epochs=4)          # the benchmark roster shape
NATIVE_ENVS = 65536
NATIVE_BUDGET = NATIVE_ENVS * 50 * 20          # 20 updates at native batch


def eval_policy(state, cfg, n_episodes=30, seed_offset=4000):
    """The benchmark protocol's seeded deterministic evaluation."""
    policy = ppo.make_eval_policy(im.ENV, PARAMS, cfg, deterministic=True)
    totals, _ = vecenv.evaluate_episodes_seeded(
        im.ENV, PARAMS, policy, (state.params, state.rms),
        jax.numpy.asarray(seed_offset + np.arange(n_episodes)))
    totals = np.asarray(totals)
    return float(totals.mean()), float(totals.std(ddof=1) /
                                       np.sqrt(n_episodes))


def run_row(name, cfg, budget):
    t0 = time.time()
    state, _metrics = ppo.train(im.ENV, PARAMS, cfg,
                                jax.random.PRNGKey(SEED), budget)
    wall = time.time() - t0
    avg, se = eval_policy(state, cfg)
    row = dict(row=name, num_envs=cfg.num_envs,
               shuffle=cfg.resolved_shuffle(cfg.num_envs), budget=budget,
               avg_reward=round(avg, 1), eval_se=round(se, 1),
               train_wall_s=round(wall, 1),
               trained_steps_per_s=round(budget / wall))
    print(json.dumps(row), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def main():
    print(json.dumps({"protocol": "IM-backlog periods=50, eval 30 eps "
                      "seeds 4000+", "backend": jax.default_backend()}),
          flush=True)
    if "1" in ROWS:
        run_row("shuffled_protocol", BASE.replace(shuffle_minibatches=True),
                2_000_000)
    if "2" in ROWS:
        run_row("envsliced_protocol",
                BASE.replace(shuffle_minibatches=False), 2_000_000)
    if "3" in ROWS:
        run_row("shuffled_native",
                BASE.replace(num_envs=NATIVE_ENVS,
                             shuffle_minibatches=True), NATIVE_BUDGET)
        run_row("envsliced_native",
                BASE.replace(num_envs=NATIVE_ENVS,
                             shuffle_minibatches=False), NATIVE_BUDGET)


if __name__ == "__main__":
    main()
