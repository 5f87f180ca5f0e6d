"""Measure the policy-in-kernel InvManagement evaluator against the XLA
learned-policy path (the round-4 stretch goal: fused deterministic MLP
eval at >=5x the XLA vmap rollout).

Prints one JSON line per configuration. Run on the TPU:
    python tools/policy_kernel_probe.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from or_gym_inventory_tpu.utils.compile_cache import \
    enable_persistent_compile_cache

enable_persistent_compile_cache()

from or_gym_inventory_tpu.agents import ppo
from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek
from or_gym_inventory_tpu.vector import vecenv

E_LIST = tuple(int(x) for x in os.environ.get("OGT_E", "1,2,4").split(","))
LANES = tuple(int(x) for x in os.environ.get(
    "OGT_LANES", str(1 << 20) + "," + str(1 << 22)).split(","))
XLA_LANES = int(os.environ.get("OGT_XLA_LANES", str(1 << 18)))


def time_fn(f, n=4):
    float(f(0))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(f(i + 1))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    params = im.default_params()
    cfg = ppo.PPOConfig(pi_arch=(64, 64))
    model = ppo._make_model(im.ENV, params, cfg)
    obs_dim = im.ENV.observation_space(params).shape[0]
    mp = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, obs_dim), jnp.float32))
    rms = ppo.RunningMeanStd.create(obs_dim)
    rms = rms.update(50.0 + 20.0 * jax.random.normal(jax.random.PRNGKey(1),
                                                     (256, obs_dim)))
    actor = pek.fold_actor_params(cfg, mp, rms)
    T = params.periods

    # --- XLA learned-policy baseline: policy+env vmap rollout, whole episode
    policy = ppo.make_eval_policy(im.ENV, params, cfg, deterministic=True)
    ps = (mp, rms)

    def xla_run(key):
        _, traj = vecenv.rollout(im.ENV, params,
                                 lambda _s, obs, k, t: policy(ps, obs, k, t),
                                 None, key, XLA_LANES, T)
        return jnp.sum(traj.reward)

    fn = jax.jit(lambda i: xla_run(jax.random.PRNGKey(i)))
    best = time_fn(lambda i: fn(i))
    xla_sps = XLA_LANES * T / best
    print(json.dumps({"path": "xla_policy_rollout", "lanes": XLA_LANES,
                      "time_ms": round(best * 1e3, 2),
                      "steps_per_s": round(xla_sps)}), flush=True)

    # --- fused policy-in-kernel
    for lanes in LANES:
        for E in E_LIST:
            fn = jax.jit(lambda s, E=E, lanes=lanes:
                         pek.episode_returns_im_policy(
                             params, actor, s, lanes, block=1024,
                             episodes_per_lane=E).sum())
            try:
                best = time_fn(fn)
            except Exception as e:
                print(json.dumps({"path": "policy_kernel", "E": E,
                                  "lanes": lanes,
                                  "error": str(e)[:160]}), flush=True)
                continue
            sps = lanes * E * T / best
            print(json.dumps({
                "path": "policy_kernel", "E": E, "lanes": lanes,
                "time_ms": round(best * 1e3, 2), "steps_per_s": round(sps),
                "vs_xla_policy": round(sps / xla_sps, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
