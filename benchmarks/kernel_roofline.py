"""Roofline decomposition of the whole-episode kernel headline (TPU).

Answers "where does the time go, and how far from speed-of-light are we?"
for the bench.py operating point (NetInvMgmt, 1M envs x 30 periods) and the
other two families' episode kernels:

  1. demand sampling alone (XLA Poisson rejection sampler — the only other
     work in the headline run)
  2. episode kernel alone, demands pre-materialized (same device buffers
     reused across timings)
  3. end-to-end (sampling + kernel, = bench.py's number)
  4. block-size sweep for all three family kernels at 1M envs

Prints one JSON line per measurement. Run (TPU): python benchmarks/kernel_roofline.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.envs import newsvendor as nv
from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek
from or_gym_inventory_tpu.ops import pallas_net_step as pk

BATCH = 1_048_576
NUM_STEPS = 30


def time_fn(f, *args, n=4):
    # host fetch, not block_until_ready (PERFORMANCE.md integrity note)
    float(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    params = net.default_params(num_periods=NUM_STEPS)
    T = params.topology
    lam = jnp.asarray([s[1] for s in T.rt_demand], jnp.float32)
    hi = float(T.order_cap_heuristic * 2)

    # --- 1. demand sampling alone -----------------------------------------
    @jax.jit
    def sample_only(key):
        dems = jax.random.poisson(
            key, lam[None, :, None],
            (NUM_STEPS, T.n_retail, BATCH)).astype(jnp.float32)
        return dems.sum()

    t_sample = time_fn(sample_only, jax.random.PRNGKey(0))
    emit(component="net_demand_sampling", batch=BATCH, seconds=round(t_sample, 4),
         values=NUM_STEPS * T.n_retail * BATCH)

    # --- 2. kernel alone (demands pre-materialized) ------------------------
    dems = jax.jit(lambda k: jax.random.poisson(
        k, lam[None, :, None],
        (NUM_STEPS, T.n_retail, BATCH)).astype(jnp.float32))(jax.random.PRNGKey(1))
    dems.block_until_ready()

    def kernel_only(seed, dems):
        return pk.episode_returns_random_policy(params, dems, seed, hi,
                                                block=1024).sum()

    ko = jax.jit(kernel_only)
    t_kernel = time_fn(ko, jnp.asarray(7, jnp.int32), dems)
    emit(component="net_episode_kernel_only", batch=BATCH,
         seconds=round(t_kernel, 4),
         steps_per_s=round(BATCH * NUM_STEPS / t_kernel))

    # --- 3. end to end (bench.py path) -------------------------------------
    @jax.jit
    def end_to_end(key):
        dkey, skey = jax.random.split(key)
        d = jax.random.poisson(dkey, lam[None, :, None],
                               (NUM_STEPS, T.n_retail, BATCH)).astype(jnp.float32)
        seed = jax.random.randint(skey, (), 0, 2**31 - 1)
        return pk.episode_returns_random_policy(params, d, seed, hi,
                                                block=1024).sum()

    t_e2e = time_fn(end_to_end, jax.random.PRNGKey(2))
    emit(component="net_end_to_end", batch=BATCH, seconds=round(t_e2e, 4),
         steps_per_s=round(BATCH * NUM_STEPS / t_e2e))

    # --- 4. block sweep -----------------------------------------------------
    for block in (512, 1024, 2048, 4096, 8192):
        try:
            f = jax.jit(lambda seed, d, b=block: pk.episode_returns_random_policy(
                params, d, seed, hi, block=b).sum())
            t = time_fn(f, jnp.asarray(7, jnp.int32), dems)
            emit(component="net_kernel_block_sweep", block=block,
                 seconds=round(t, 4), steps_per_s=round(BATCH * NUM_STEPS / t))
        except Exception as e:
            emit(component="net_kernel_block_sweep", block=block,
                 error=str(e)[:160])

    # --- newsvendor / inv management kernels: sampling-vs-kernel + sweep ---
    nvp = nv.default_params()

    @jax.jit
    def nv_inputs(key):
        k1, k2 = jax.random.split(key)
        econ = jax.vmap(lambda k: nv.draw_econ(nvp, k), out_axes=1)(
            jax.random.split(k1, BATCH))
        d = jax.random.poisson(k2, econ[4],
                               (nvp.step_limit, BATCH)).astype(jnp.float32)
        return econ, d

    t_nv_in = time_fn(lambda k: nv_inputs(k)[1].sum(), jax.random.PRNGKey(3))
    emit(component="nv_input_sampling", batch=BATCH, seconds=round(t_nv_in, 4),
         values=nvp.step_limit * BATCH)
    econ, nvd = jax.tree_util.tree_map(lambda x: x.block_until_ready(),
                                       nv_inputs(jax.random.PRNGKey(4)))
    for block in (1024, 2048, 4096, 8192):
        try:
            f = jax.jit(lambda s, e, d, b=block: pek.episode_returns_nv_random(
                nvp, e, d, s, block=b).sum())
            t = time_fn(f, jnp.asarray(7, jnp.int32), econ, nvd)
            emit(component="nv_kernel_block_sweep", block=block,
                 seconds=round(t, 4),
                 steps_per_s=round(BATCH * nvp.step_limit / t))
        except Exception as e:
            emit(component="nv_kernel_block_sweep", block=block,
                 error=str(e)[:160])

    imp = im.default_params()
    mu = float(dict(imp.dist_param).get("mu", 20))

    @jax.jit
    def im_dems(key):
        return jax.random.poisson(key, mu, (imp.periods, BATCH)).astype(jnp.int32)

    t_im_in = time_fn(lambda k: im_dems(k).sum(), jax.random.PRNGKey(5))
    emit(component="im_demand_sampling", batch=BATCH, seconds=round(t_im_in, 4),
         values=imp.periods * BATCH)
    imd = im_dems(jax.random.PRNGKey(6)).block_until_ready()
    for block in (1024, 2048, 4096, 8192):
        try:
            f = jax.jit(lambda s, d, b=block: pek.episode_returns_im_random(
                imp, d, s, block=b).sum())
            t = time_fn(f, jnp.asarray(7, jnp.int32), imd)
            emit(component="im_kernel_block_sweep", block=block,
                 seconds=round(t, 4),
                 steps_per_s=round(BATCH * imp.periods / t))
        except Exception as e:
            emit(component="im_kernel_block_sweep", block=block,
                 error=str(e)[:160])


if __name__ == "__main__":
    main()
