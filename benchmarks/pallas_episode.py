"""TPU head-to-head of the three NetInvMgmt rollout paths at the headline
operating point (262,144 envs x 30 periods, random actions):

  1. xla      — jit(vmap(step) inside lax.scan)   (bench.py path)
  2. pallas   — per-period fused kernel inside lax.scan
  3. episode  — whole-episode kernel (state VMEM-resident across all 30
                periods); actions/demand pre-sampled by XLA, so the timing
                is honest end-to-end (sampling + kernel).

Prints one JSON line per (path, batch, block). Run: python benchmarks/pallas_episode.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.ops import pallas_net_step as pk
from or_gym_inventory_tpu.vector import vecenv

NUM_STEPS = 30
BATCHES = [65536, 262144]


def time_fn(f, n=4):
    # host fetch, not block_until_ready (see PERFORMANCE.md integrity note)
    float(f(jax.random.PRNGKey(0)))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(f(jax.random.PRNGKey(i + 1)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    params = net.default_params(num_periods=NUM_STEPS)
    T = params.topology
    space = net.ENV.action_space(params)
    lam = jnp.asarray([s[1] if s[0] == "poisson" else 0.0
                       for s in T.rt_demand], jnp.float32)
    hi = T.order_cap_heuristic * 2

    for batch in BATCHES:
        # --- 1. XLA scan path ---
        def policy(_s, obs, key, _t):
            return space.sample(key, (obs.shape[0],))

        xla = jax.jit(lambda key, n=batch: vecenv.rollout(
            net.ENV, params, policy, None, key, n, NUM_STEPS)[1].reward.sum())
        best = time_fn(xla)
        print(json.dumps({"path": "xla", "batch": batch,
                          "steps_per_s": round(batch * NUM_STEPS / best)}),
              flush=True)

        # --- 2. Pallas per-period kernel in a scan ---
        for block in (2048,):
            f = jax.jit(lambda key, n=batch, b=block: pk.rollout_transposed(
                params, key, n, NUM_STEPS, block=b))
            best = time_fn(f)
            print(json.dumps({"path": "pallas_step", "batch": batch,
                              "block": block,
                              "steps_per_s": round(batch * NUM_STEPS / best)}),
                  flush=True)

        # --- 3. Whole-episode kernel (end-to-end incl. sampling) ---
        for block in (512, 1024, 2048):
            def ep(key, n=batch, b=block):
                akey, dkey = jax.random.split(key)
                acts = jax.random.uniform(
                    akey, (NUM_STEPS, T.n_reorder, n), minval=0.0, maxval=hi)
                dems = jax.random.poisson(
                    dkey, lam[None, :, None],
                    (NUM_STEPS, T.n_retail, n)).astype(jnp.float32)
                return pk.episode_returns(params, acts, dems, block=b).sum()

            try:
                f = jax.jit(ep)
                best = time_fn(f)
                print(json.dumps(
                    {"path": "pallas_episode", "batch": batch, "block": block,
                     "steps_per_s": round(batch * NUM_STEPS / best)}),
                    flush=True)
                if block == 1024:
                    def ep_returns(key, n=batch, b=block):
                        akey, dkey = jax.random.split(key)
                        acts = jax.random.uniform(
                            akey, (NUM_STEPS, T.n_reorder, n),
                            minval=0.0, maxval=hi)
                        dems = jax.random.poisson(
                            dkey, lam[None, :, None],
                            (NUM_STEPS, T.n_retail, n)).astype(jnp.float32)
                        return pk.episode_returns(params, acts, dems, block=b)
                    import numpy as np
                    r = np.asarray(jax.jit(ep_returns)(jax.random.PRNGKey(7)))
                    print(json.dumps(
                        {"path": "pallas_episode", "batch": batch,
                         "check_mean": float(r.mean()),
                         "check_std": float(r.std())}), flush=True)
            except Exception as e:
                print(json.dumps({"path": "pallas_episode", "batch": batch,
                                  "block": block, "error": str(e)[:200]}),
                      flush=True)

        # --- 4. Whole-episode kernel with IN-KERNEL action sampling ---
        for block in (1024,):
            def epk(key, n=batch, b=block):
                dkey, skey = jax.random.split(key)
                dems = jax.random.poisson(
                    dkey, lam[None, :, None],
                    (NUM_STEPS, T.n_retail, n)).astype(jnp.float32)
                seed = jax.random.randint(skey, (), 0, 2**31 - 1)
                return pk.episode_returns_random_policy(
                    params, dems, seed, hi, block=b)

            try:
                f = jax.jit(lambda key: epk(key).sum())
                best = time_fn(f)
                print(json.dumps(
                    {"path": "pallas_episode_inkernel_rng", "batch": batch,
                     "block": block,
                     "steps_per_s": round(batch * NUM_STEPS / best)}),
                    flush=True)
                # distribution consistency vs XLA-sampled actions
                r = jax.jit(epk)(jax.random.PRNGKey(7))
                import numpy as np
                print(json.dumps(
                    {"path": "pallas_episode_inkernel_rng", "batch": batch,
                     "check_mean": float(np.mean(np.asarray(r))),
                     "check_std": float(np.std(np.asarray(r)))}), flush=True)
            except Exception as e:
                print(json.dumps({"path": "pallas_episode_inkernel_rng",
                                  "batch": batch, "block": block,
                                  "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
