"""Quickstart tour of or-gym-inventory-tpu.

Runs on CPU or TPU unchanged:  python examples/quickstart.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------- 1. drop-in
# Gymnasium API identical to the reference repo (bitwise-parity adapters)
from or_gym_inventory_tpu.envs.adapters import InvManagementBacklogEnv

env = InvManagementBacklogEnv(env_config={"periods": 30})
obs, info = env.reset(seed=42)
total = 0.0
for _ in range(30):
    obs, reward, terminated, truncated, info = env.step(
        np.array([20, 20, 20], np.int64))
    total += reward
print(f"[drop-in] seed-42 episode total reward: {total:.4f} "
      "(BASELINE.md golden: 4700.7806)")

# --------------------------------------------------- 2. vectorized TPU engine
from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.vector import rollout

params = net.default_params(num_periods=30)
space = net.ENV.action_space(params)
policy = lambda _s, obs, key, t: space.sample(key, (obs.shape[0],))
carry, traj = jax.jit(
    lambda k: rollout(net.ENV, params, policy, None, k, 4096, 30))(
        jax.random.PRNGKey(0))
print(f"[vectorized] 4096 envs x 30 steps in one program; "
      f"mean step reward {float(traj.reward.mean()):.2f}")

# ------------------------------------------------------- 3. heuristic agents
from or_gym_inventory_tpu.agents import heuristics as H
from or_gym_inventory_tpu.vector import evaluate_episodes
from or_gym_inventory_tpu.envs import inv_management as im

im_params = im.default_params(periods=30)
agent = H.BaseStockAgent(1.0)
totals, _ = evaluate_episodes(im.ENV, im_params,
                              agent.device_policy(im.ENV, im_params), None,
                              jax.random.PRNGKey(1), 256)
print(f"[heuristics] BaseStock over 256 on-device episodes: "
      f"mean {float(jnp.mean(totals)):.1f}")

# ------------------------------------------- 3b. fastest path: episode kernels
from or_gym_inventory_tpu.vector import random_episode_returns

# Whole-episode Pallas kernel on TPU (state VMEM-resident across the
# horizon, in-kernel hardware-PRNG actions AND demand); XLA fallback
# elsewhere. episodes_per_lane interleaves independent episodes per VPU
# lane — the full-scale configuration (4M lanes x 8) measures 8.6-14.7B
# env-steps/s on one v5e chip (PERFORMANCE.md).
returns = random_episode_returns(im_params, jax.random.PRNGKey(4),
                                 batch=4096, episodes_per_lane=2)
print(f"[fast-episodes] {returns.shape[0]} random-policy episodes, one "
      f"launch: mean {float(jnp.mean(returns)):.1f}")

# ------------------------------------------------------------- 4. on-device RL
from or_gym_inventory_tpu.agents import ppo

cfg = ppo.PPOConfig(num_envs=64, rollout_steps=30, num_minibatches=4)
state, metrics = ppo.train(im.ENV, im_params, cfg, jax.random.PRNGKey(2),
                           total_timesteps=200_000)
pol = ppo.make_eval_policy(im.ENV, im_params, cfg)
totals, _ = evaluate_episodes(im.ENV, im_params, pol,
                              (state.params, state.rms),
                              jax.random.PRNGKey(3), 256)
print(f"[ppo] after 200k steps: mean {float(jnp.mean(totals)):.1f}")

# ------------------------------------------------------- 5. checkpoint/resume
from or_gym_inventory_tpu.utils import checkpoint as ckpt

path = ckpt.save_pytree("/tmp/ogt_quickstart_policy.msgpack",
                        {"params": state.params})
print(f"[checkpoint] policy saved to {path}")

# --------------------------------------- 6. learned-policy eval, kernel speed
# the trained actor folded to plain arrays, evaluated by the
# policy-in-kernel episode evaluator (1.3-2.4B steps/s on TPU; identical
# XLA fallback elsewhere — PERFORMANCE.md round 4)
from or_gym_inventory_tpu.ops.pallas_episode_kernels import fold_actor_params
from or_gym_inventory_tpu.vector import policy_episode_returns

actor = fold_actor_params(cfg, state.params, state.rms)
rets = policy_episode_returns(im_params, actor, jax.random.PRNGKey(4),
                              batch=4096)
print(f"[policy-eval] 4096 deterministic episodes: "
      f"mean {float(jnp.mean(rets)):.1f}")

# stochastic evaluation (SB3 predict(deterministic=False) semantics):
# exploration noise from the in-kernel Box-Muller sampler on TPU
rets_s = policy_episode_returns(
    im_params, actor, jax.random.PRNGKey(5), batch=4096,
    deterministic=False, log_std=state.params["params"]["log_std"])
print(f"[policy-eval] stochastic: mean {float(jnp.mean(rets_s)):.1f}")

# ------------------------------------- 7. kernel-rollout training (TPU only)
# PPOConfig(rollout="kernel") generates experience through the
# trajectory-emitting Pallas rollout (episode-aligned; InvManagement and
# Newsvendor) — 51.8M full-PPO trained-steps/s at 65k envs, ~7x the XLA
# rollout (PERFORMANCE.md round 5):
if jax.default_backend() == "tpu":
    kcfg = ppo.PPOConfig(rollout="kernel", num_envs=1024,
                         rollout_steps=im_params.periods,
                         num_minibatches=4)
    kstate, _ = ppo.train(im.ENV, im_params, kcfg, jax.random.PRNGKey(6),
                          total_timesteps=1024 * im_params.periods * 5)
    print(f"[kernel-ppo] {int(kstate.update_idx)} episode-aligned updates "
          "through the trajectory-emitting kernel rollout")
