"""A2C sweep round 2 — structural variants.

Round 1 (tools/a2c_sweep.py): lambda/lr/ent tweaks all converge to the same
degenerate order-nothing policy (-30.8k). Hypothesis: A2C takes ONE gradient
step per update, so at num_envs=256 a 4M-step budget is only ~2-10k updates,
vs the ~50k small-batch updates SB3's A2C shape implies. Test the SB3 shape
(few envs, tiny rollout, many updates) and an Adam variant.

Run (TPU): python tools/a2c_sweep2.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from functools import partial

from or_gym_inventory_tpu.agents.a2c import A2CAgent, A2CConfig
from or_gym_inventory_tpu.bench.evaluate import evaluate_agent
from or_gym_inventory_tpu.envs import adapters as ad
from or_gym_inventory_tpu.envs import newsvendor as nv

TIMESTEPS = int(os.environ.get("OGT_TIMESTEPS", 4_000_000))
EVAL_CONFIG = {
    "lead_time": 5, "step_limit": 50, "p_max": 100.0, "h_max": 5.0,
    "k_max": 10.0, "mu_max": 200.0,
}

CANDIDATES = {
    # SB3 shape: 16 envs x 5 steps = 80/update -> 50k updates at 4M.
    # updates_per_call scans updates on-device — without it the 50k
    # host round-trips take ~30+ min/candidate on the relayed chip.
    "sb3shape_r5e16": A2CConfig(num_envs=16, rollout_steps=5,
                                updates_per_call=500),
    # intermediate: 64 envs x 8 -> ~8k updates
    "r8e64": A2CConfig(num_envs=64, rollout_steps=8, updates_per_call=250),
    # Adam instead of RMSprop, PPO-ish shape but still 1-pass no-clip
    "adam_lam95_r50": A2CConfig(num_envs=256, rollout_steps=50,
                                gae_lambda=0.95, lr=3e-4, optimizer="adam",
                                updates_per_call=16),
    "adam_sb3shape": A2CConfig(num_envs=16, rollout_steps=5, lr=3e-4,
                               optimizer="adam", updates_per_call=500),
}


def main():
    env_factory = partial(ad.NewsvendorEnv)
    for name, cfg in CANDIDATES.items():
        agent = A2CAgent(nv.ENV, partial(nv.default_params), name=f"A2C_{name}",
                         config=cfg, model_dir="/tmp/a2c_sweep",
                         log_dir="/tmp/a2c_sweep_logs")
        t0 = time.time()
        agent.train(EVAL_CONFIG, TIMESTEPS, save_path_prefix="sweep2_")
        train_s = time.time() - t0
        res = evaluate_agent(agent, env_factory, 30, seed_offset=2000,
                             env_config=EVAL_CONFIG)
        s = res["summary"]
        print(json.dumps({
            "candidate": name,
            "avg_reward": float(s["TotalReward"].mean()),
            "median_reward": float(s["TotalReward"].median()),
            "service": float(s["AvgServiceLevel"].mean()),
            "train_s": round(train_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
