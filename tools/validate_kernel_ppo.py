"""Reward-matched validation of the kernel-rollout PPO path.

Trains PPO on the IM-backlog benchmark protocol env (periods=50) at the
same config with three experience-generation backends —

1. rollout='xla'     the fused policy+env lax.scan (the validated path)
2. rollout='kernel'  the trajectory-emitting Pallas rollout
3. rollout='kernel' + compute_dtype='bfloat16' (the throughput recipe)

— evaluates each with the benchmark protocol (30 deterministic episodes,
seeds 4000+), and reports AvgReward ± eval standard error plus training
wall time. The kernel path is episode-aligned (rollout_steps = horizon =
50) and needs num_envs % 1024 == 0, so all three rows use num_envs=1024
for apples-to-apples. Run on the TPU: python tools/validate_kernel_ppo.py
(results append to tools/remeasure_logs/validate_kernel_ppo.jsonl).
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

ROWS = tuple(os.environ.get("OGT_VK_ROWS", "xla,kernel,kernel_bf16").split(","))
SEED = int(os.environ.get("OGT_VK_SEED", "0"))
BUDGET = int(os.environ.get("OGT_VK_BUDGET", str(2_000_000)))
OUT = "tools/remeasure_logs/validate_kernel_ppo.jsonl"

PARAMS = im.default_params(backlog=True, periods=50)
BASE = ppo.PPOConfig(num_envs=1024, rollout_steps=50, num_minibatches=8,
                     update_epochs=4, shuffle_minibatches=False)


def eval_policy(state, cfg, n_episodes=30, seed_offset=4000):
    policy = ppo.make_eval_policy(im.ENV, PARAMS, cfg, deterministic=True)
    totals, _ = vecenv.evaluate_episodes_seeded(
        im.ENV, PARAMS, policy, (state.params, state.rms),
        jax.numpy.asarray(seed_offset + np.arange(n_episodes)))
    totals = np.asarray(totals)
    return float(totals.mean()), float(totals.std(ddof=1) /
                                       np.sqrt(n_episodes))


def run_row(name, cfg):
    t0 = time.time()
    state, _ = ppo.train(im.ENV, PARAMS, cfg, jax.random.PRNGKey(SEED),
                         BUDGET)
    wall = time.time() - t0
    avg, se = eval_policy(state, cfg)
    row = dict(row=name, rollout=cfg.rollout,
               compute_dtype=cfg.compute_dtype, budget=BUDGET,
               avg_reward=round(avg, 1), eval_se=round(se, 1),
               train_wall_s=round(wall, 1),
               trained_steps_per_s=round(BUDGET / wall))
    print(json.dumps(row), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def run_rppo_row(name, rollout):
    """Recurrent PPO (benchmark PPO_LSTM arch) xla-vs-kernel: both rows
    evaluated identically through the carry-threading deterministic
    evaluator (64 envs, fixed key) — a head-to-head parity check."""
    from or_gym_inventory_tpu.agents import recurrent_ppo as rp
    cfg = rp.RecurrentPPOConfig(num_envs=1024, rollout_steps=50,
                                num_minibatches=8, update_epochs=4,
                                rollout=rollout)
    t0 = time.time()
    state, eval_episodes, _ = rp.train(im.ENV, PARAMS, cfg,
                                       jax.random.PRNGKey(SEED), BUDGET)
    wall = time.time() - t0
    totals = np.asarray(jax.jit(eval_episodes, static_argnums=3)(
        state.params, state.rms, jax.random.PRNGKey(4000), 64))
    row = dict(row=name, rollout=rollout, budget=BUDGET,
               avg_reward=round(float(totals.mean()), 1),
               eval_se=round(float(totals.std(ddof=1) / np.sqrt(64)), 1),
               train_wall_s=round(wall, 1),
               trained_steps_per_s=round(BUDGET / wall))
    print(json.dumps(row), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def main():
    print(json.dumps({"protocol": "IM-backlog periods=50, eval 30 eps "
                      "seeds 4000+, num_envs=1024 rollout_steps=50",
                      "backend": jax.default_backend()}), flush=True)
    if "xla" in ROWS:
        run_row("xla", BASE)
    if "kernel" in ROWS:
        run_row("kernel", BASE.replace(rollout="kernel"))
    if "kernel_bf16" in ROWS:
        run_row("kernel_bf16", BASE.replace(rollout="kernel",
                                            compute_dtype="bfloat16"))
    if "rppo_xla" in ROWS:
        run_rppo_row("rppo_xla", "xla")
    if "rppo_kernel" in ROWS:
        run_rppo_row("rppo_kernel", "kernel")


if __name__ == "__main__":
    main()
