"""TPU measurement: whole-episode Pallas kernels vs XLA rollout for the
Newsvendor and InvManagement families (random policy, default horizons).

Prints one JSON line per (env, path, batch). Run: python benchmarks/episode_kernels_bench.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.envs import newsvendor as nv
from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek
from or_gym_inventory_tpu.vector import vecenv

BATCHES = [262144, 1048576]


def time_fn(f, n=4):
    # host fetch, not block_until_ready (PERFORMANCE.md integrity note)
    float(f(jax.random.PRNGKey(0)))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(f(jax.random.PRNGKey(i + 1)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(name, steps, xla_fn, kernel_fn, check_fn=None, fused_fn=None):
    paths = [("xla", xla_fn), ("pallas_episode", kernel_fn)]
    if fused_fn is not None:
        paths.append(("pallas_fused", fused_fn))
    for batch in BATCHES:
        for path, fn in paths:
            try:
                best = time_fn(jax.jit(lambda k, b=batch, f=fn: f(k, b)))
                print(json.dumps({"env": name, "path": path, "batch": batch,
                                  "steps_per_s": round(batch * steps / best)}),
                      flush=True)
            except Exception as e:
                print(json.dumps({"env": name, "path": path, "batch": batch,
                                  "error": str(e)[:200]}), flush=True)
    if check_fn is not None:
        check_fn()


def main():
    # ----------------------------------------------------------- newsvendor
    p = nv.default_params()
    space = nv.ENV.action_space(p)

    def nv_xla(key, batch):
        policy = lambda _s, obs, k, t: space.sample(k, (obs.shape[0],))
        _, traj = vecenv.rollout(nv.ENV, p, policy, None, key, batch,
                                 p.step_limit)
        return jnp.sum(traj.reward)

    def nv_kernel(key, batch):
        k1, k2, k3 = jax.random.split(key, 3)
        econ = jax.vmap(lambda k: nv.draw_econ(p, k), out_axes=1)(
            jax.random.split(k1, batch))
        dems = jax.random.poisson(k2, econ[4], (p.step_limit, batch)
                                  ).astype(jnp.float32)
        seed = jax.random.randint(k3, (), 0, 2**31 - 1)
        return pek.episode_returns_nv_random(p, econ, dems, seed,
                                             block=1024).sum()

    def nv_fused(key, batch):
        # fully-fused: actions AND per-lane dynamic-mu Poisson demand
        # sampled in-kernel; only the 5-row econ reset stays in XLA
        k1, k2 = jax.random.split(key)
        econ = jax.vmap(lambda k: nv.draw_econ(p, k), out_axes=1)(
            jax.random.split(k1, batch))
        seed = jax.random.randint(k2, (), 0, 2**31 - 1)
        return pek.episode_returns_nv_fused(p, econ, seed, block=2048).sum()

    def nv_check():
        import numpy as np
        k = jax.random.PRNGKey(7)
        a = float(jax.jit(lambda k: nv_xla(k, 262144))(k)) / 262144
        b = float(jax.jit(lambda k: nv_kernel(k, 262144))(k)) / 262144
        c = float(jax.jit(lambda k: nv_fused(k, 262144))(k)) / 262144
        print(json.dumps({"env": "newsvendor", "check_mean_xla": round(a, 1),
                          "check_mean_kernel": round(b, 1),
                          "check_mean_fused": round(c, 1)}), flush=True)

    bench("newsvendor", p.step_limit, nv_xla, nv_kernel, nv_check,
          fused_fn=nv_fused)

    # -------------------------------------------------------- invmanagement
    pi = im.default_params()
    ispace = im.ENV.action_space(pi)

    def im_xla(key, batch):
        policy = lambda _s, obs, k, t: ispace.sample(k, (obs.shape[0],))
        _, traj = vecenv.rollout(im.ENV, pi, policy, None, key, batch,
                                 pi.periods)
        return jnp.sum(traj.reward)

    def im_kernel(key, batch):
        k1, k2 = jax.random.split(key)
        dems = jax.random.poisson(k1, 20.0, (pi.periods, batch)
                                  ).astype(jnp.int32)
        seed = jax.random.randint(k2, (), 0, 2**31 - 1)
        return pek.episode_returns_im_random(pi, dems, seed, block=1024).sum()

    def im_fused(key, batch):
        # fully-fused: actions AND Poisson demand sampled in-kernel,
        # 4 independent episodes interleaved per lane (ILP pipelining —
        # PERFORMANCE.md "the ILP ceiling measured, then broken")
        E = 4
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        return pek.episode_returns_im_fused(pi, seed, batch // E, block=2048,
                                            episodes_per_lane=E).sum()

    def im_check():
        k = jax.random.PRNGKey(7)
        a = float(jax.jit(lambda k: im_xla(k, 262144))(k)) / 262144
        b = float(jax.jit(lambda k: im_kernel(k, 262144))(k)) / 262144
        c = float(jax.jit(lambda k: im_fused(k, 262144))(k)) / 262144
        print(json.dumps({"env": "inv_mgmt", "check_mean_xla": round(a, 1),
                          "check_mean_kernel": round(b, 1),
                          "check_mean_fused": round(c, 1)}), flush=True)

    bench("inv_mgmt", pi.periods, im_xla, im_kernel, im_check,
          fused_fn=im_fused)


if __name__ == "__main__":
    main()
