"""A2C hyperparameter sweep harness on the Newsvendor benchmark protocol.

One parameterized harness (consolidates the four round-specific scripts this
repo grew during round 2 — same measurements, one code path). Each candidate
trains at the benchmark budget and is evaluated with the benchmark's own
protocol (30 episodes, seeds 2000+, lead_time=5 eval env). Conclusions are
recorded in RESULTS.md ("A2C variants" note).

Measured history (TPU, 4M steps each):
- round1 (lambda/lr/ent tweaks on the 256-env shape): ALL converge to the
  same degenerate order-nothing policy (~-30.8k vs PPO's +97k).
- round2 (SB3 shape 16x5 with many updates; Adam): same corner.
- round3 (minibatched single-pass — more gradient steps per batch, still
  unclipped/1-epoch = A2C semantics): mb8_rmsprop -10.2k; the axis that
  moves.
- round4 (deeper minibatching): mb32 reaches +106k, topping the Newsvendor
  table; shipped as the A2C_MB32 roster entry (benchmarks/*.py).

Run (TPU): python tools/a2c_sweep.py [round1|round2|round3|round4|NAME...]
(no args = round4). NAMEs may also pick individual candidates from any set.
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
BASE = dict(num_envs=256, rollout_steps=50, updates_per_call=16)

CANDIDATE_SETS = {
    "round1": {
        "default": A2CConfig(num_envs=256),
        "lam95_r50": A2CConfig(num_envs=256, rollout_steps=50,
                               gae_lambda=0.95),
        "lam90_r8": A2CConfig(num_envs=256, gae_lambda=0.9),
        "lam95_r50_lr3e4": A2CConfig(num_envs=256, rollout_steps=50,
                                     gae_lambda=0.95, lr=3e-4),
        "lam95_r50_ent01": A2CConfig(num_envs=256, rollout_steps=50,
                                     gae_lambda=0.95, ent_coef=0.01),
        "lr1e4_r8": A2CConfig(num_envs=256, lr=1e-4),
    },
    "round2": {
        # SB3 shape: 16 envs x 5 steps = 80/update -> 50k updates at 4M;
        # updates_per_call scans them on-device (50k host round-trips would
        # take ~30+ min/candidate on the relayed chip)
        "sb3shape_r5e16": A2CConfig(num_envs=16, rollout_steps=5,
                                    updates_per_call=500),
        "r8e64": A2CConfig(num_envs=64, rollout_steps=8,
                           updates_per_call=250),
        "adam_lam95_r50": A2CConfig(num_envs=256, rollout_steps=50,
                                    gae_lambda=0.95, lr=3e-4,
                                    optimizer="adam", updates_per_call=16),
        "adam_sb3shape": A2CConfig(num_envs=16, rollout_steps=5, lr=3e-4,
                                   optimizer="adam", updates_per_call=500),
    },
    "round3": {
        # minibatched single-pass: N gradient steps/batch, still
        # unclipped/1-epoch = A2C semantics
        "mb8_rmsprop": A2CConfig(num_minibatches=8, **BASE),
        "mb8_adam_lam95": A2CConfig(num_minibatches=8, optimizer="adam",
                                    lr=3e-4, gae_lambda=0.95, **BASE),
        "mb8_ent01_adam": A2CConfig(num_minibatches=8, optimizer="adam",
                                    lr=3e-4, gae_lambda=0.95, ent_coef=0.01,
                                    **BASE),
        "ent01": A2CConfig(ent_coef=0.01, **BASE),
        "anneal": A2CConfig(anneal_lr=True, **BASE),
        "lr2e3": A2CConfig(lr=2e-3, **BASE),
    },
    "round4": {
        "mb16": A2CConfig(num_minibatches=16, **BASE),
        "mb32": A2CConfig(num_minibatches=32, **BASE),
        "mb8_anneal": A2CConfig(num_minibatches=8, anneal_lr=True, **BASE),
        "mb16_anneal": A2CConfig(num_minibatches=16, anneal_lr=True, **BASE),
        "mb8_ent01": A2CConfig(num_minibatches=8, ent_coef=0.01, **BASE),
        "mb8_lr2e3": A2CConfig(num_minibatches=8, lr=2e-3, **BASE),
        "mb16_lam95": A2CConfig(num_minibatches=16, gae_lambda=0.95, **BASE),
    },
}


def resolve(args):
    """Each arg is a set name or an individual candidate name."""
    if not args:
        return dict(CANDIDATE_SETS["round4"])
    chosen = {}
    for a in args:
        if a in CANDIDATE_SETS:
            chosen.update(CANDIDATE_SETS[a])
            continue
        hits = {name: cfg for cands in CANDIDATE_SETS.values()
                for name, cfg in cands.items() if name == a}
        if not hits:
            raise SystemExit(f"unknown sweep set/candidate: {a!r} "
                             f"(sets: {sorted(CANDIDATE_SETS)})")
        chosen.update(hits)
    return chosen


def main(args=None):
    candidates = resolve(sys.argv[1:] if args is None else args)
    env_factory = partial(ad.NewsvendorEnv)
    for name, cfg in candidates.items():
        agent = A2CAgent(nv.ENV, partial(nv.default_params),
                         name=f"A2C_{name}", config=cfg,
                         model_dir="/tmp/a2c_sweep",
                         log_dir="/tmp/a2c_sweep_logs")
        t0 = time.time()
        agent.train(EVAL_CONFIG, TIMESTEPS, save_path_prefix="sweep_")
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
