"""Re-measure DDPG on InvManagement lost-sales (VERDICT round-1 weak #5).

Round-1 RESULTS.md has DDPG at -89 avg reward / 17% service on the
lost-sales protocol (30 eps, seeds 5000+, periods=30, mu=20, 2M steps)
while PPO makes +8.5k. Since then the off-policy action convention changed
(critics on tanh-squashed actions, SB3-style post-squash exploration,
commit e53f8a4), which plausibly fixes the collapse. This re-trains DDPG
(and TD3 as a control — it also sat at a saturated corner on the backlog
variant) with the current code and prints one JSON line per agent.

Run (TPU): OGT_TIMESTEPS=2000000 python tools/ddpg_ls_recheck.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from functools import partial

from or_gym_inventory_tpu.agents.off_policy import (DDPGAgent, OffPolicyConfig,
                                                    TD3Agent)
from or_gym_inventory_tpu.bench.evaluate import evaluate_agent
from or_gym_inventory_tpu.envs import adapters as ad
from or_gym_inventory_tpu.envs import inv_management as im

TIMESTEPS = int(os.environ.get("OGT_TIMESTEPS", 2_000_000))
ENV_CONFIG = {"periods": 30, "dist_param": {"mu": 20}}
OFF_CFG = OffPolicyConfig(num_envs=32, buffer_size=100_000, batch_size=256,
                          start_steps=1_000)


def main():
    pf = partial(im.default_params, backlog=False)
    env_factory = partial(ad.InvManagementLostSalesEnv)
    roster = [
        ("DDPG", DDPGAgent(im.ENV, pf, config=OFF_CFG,
                           model_dir="/tmp/ddpg_recheck",
                           log_dir="/tmp/ddpg_recheck_logs")),
        ("TD3", TD3Agent(im.ENV, pf, config=OFF_CFG,
                         model_dir="/tmp/ddpg_recheck",
                         log_dir="/tmp/ddpg_recheck_logs")),
    ]
    for name, agent in roster:
        agent.force_retrain = True
        t0 = time.time()
        agent.train(ENV_CONFIG, TIMESTEPS, save_path_prefix="recheck_")
        train_s = time.time() - t0
        res = evaluate_agent(agent, env_factory, 30, seed_offset=5000,
                             env_config=ENV_CONFIG)
        s = res["summary"]
        print(json.dumps({
            "agent": name,
            "avg_reward": float(s["TotalReward"].mean()),
            "median_reward": float(s["TotalReward"].median()),
            "service": float(s["AvgServiceLevel"].mean()),
            "stockout": float(s["AvgStockoutQty"].mean())
            if "AvgStockoutQty" in s else None,
            "train_s": round(train_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
