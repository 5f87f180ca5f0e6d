"""Probe: does a (rows, 8, 128) block layout beat (rows, B) for the fused
episode kernel?

Hypothesis from the roofline: row slices X_ref[i, :] are (block,) vectors
that Mosaic lays out on ONE sublane (native f32 tile is 8x128), so every
vector op uses 1/8 of the VPU. Reshaping the batch to (B//128, 128) and
blocking (rows, 8, 128) makes each row slice a native (8, 128) tile.

Run (TPU): python tools/layout_probe.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.ops import pallas_net_step as pns

BATCH = 1_048_576
NUM_STEPS = 30


def _episode_kernel_body_fused_3d(
        T, backlog, n_main, n_ro, n_rt, lt, num_steps, alpha, act_hi,
        cdf_tables, seed_ref, X_ref, Y_ref, U_ref, RH_ref, rew_ref):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    X = [X_ref[i] for i in range(n_main)]          # each (8, 128)
    Y = [Y_ref[i] for i in range(n_ro)]
    U = [U_ref[i] for i in range(n_rt)]
    RH = [RH_ref[r] for r in range(lt * n_ro)]
    total = jnp.zeros_like(X[0])
    one = jnp.ones_like(X[0])
    tile = X[0].shape
    scale = act_hi / float(1 << 24)
    for t in range(num_steps):
        bits = pltpu.bitcast(
            pltpu.prng_random_bits((n_ro,) + tile), jnp.uint32)
        u24 = jax.lax.shift_right_logical(bits, jnp.uint32(8))
        acts = pltpu.bitcast(u24, jnp.int32).astype(jnp.float32) * scale
        act = [acts[i] for i in range(n_ro)]
        du = pltpu.bitcast(pltpu.prng_random_bits((n_rt,) + tile), jnp.uint32)
        du24 = jax.lax.shift_right_logical(du, jnp.uint32(8))
        u = pltpu.bitcast(du24, jnp.int32).astype(jnp.float32) * (2.0 ** -24)
        dem = [pns._link_demand(cdf_tables[j], u[j], t) for j in range(n_rt)]
        valid = [one if t >= L else jnp.zeros_like(one) for L in T.ro_L]
        X, Y, U, r_cur, profit = pns._step_math(
            T, backlog, X, Y, U, RH, act, dem, valid)
        RH = r_cur + RH[: (lt - 1) * n_ro]
        total = total + (alpha ** t) * profit
    rew_ref[0] = total


def episode_returns_fused_3d(params, seed, act_hi, batch, block=1024):
    T = params.topology
    n_main, n_ro, n_rt = T.n_main, T.n_reorder, T.n_retail
    lt = max(T.lt_max, 1)
    num_steps = params.num_periods
    assert batch % (block * 128) == 0 or batch % block == 0
    sub = block // 128  # sublane rows per tile
    cdf_tables = pns._topology_link_specs(T, num_steps)
    X, Y, U, RH = pns.init_transposed(params, batch)
    shape3 = lambda rows: (rows, batch // 128, 128)

    def spec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    kernel = partial(_episode_kernel_body_fused_3d, T, params.backlog,
                     n_main, n_ro, n_rt, lt, num_steps, params.alpha,
                     float(act_hi), cdf_tables)
    out = pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec(n_main), spec(n_ro), spec(n_rt), spec(lt * n_ro)],
        out_specs=spec(1),
        out_shape=jax.ShapeDtypeStruct(shape3(1), jnp.float32),
    )(jnp.asarray(seed, jnp.int32).reshape(1),
      X.reshape(shape3(n_main)), Y.reshape(shape3(n_ro)),
      U.reshape(shape3(n_rt)), RH.reshape(shape3(lt * n_ro)))
    return out.reshape(batch)


def time_fn(f, n=4):
    float(f(jnp.asarray(1, jnp.int32))[0])
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(f(jnp.asarray(i + 2, jnp.int32))[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    params = net.default_params(num_periods=NUM_STEPS)
    hi = float(params.topology.order_cap_heuristic * 2)

    f2d = jax.jit(lambda s: pns.episode_returns_fully_fused(
        params, s, hi, BATCH, block=1024))
    t2d = time_fn(f2d)
    print(json.dumps({"layout": "2d (rows, B)", "seconds": round(t2d, 4),
                      "steps_per_s": round(BATCH * NUM_STEPS / t2d)}),
          flush=True)

    for block in (1024, 2048, 4096):
        f3d = jax.jit(lambda s, b=block: episode_returns_fused_3d(
            params, s, hi, BATCH, block=b))
        # sanity: mean return should agree statistically with the 2d path
        m2 = float(jnp.mean(f2d(jnp.asarray(9, jnp.int32))))
        m3 = float(jnp.mean(f3d(jnp.asarray(9, jnp.int32))))
        t3d = time_fn(f3d)
        print(json.dumps({"layout": f"3d (rows, {block // 128}, 128)",
                          "block": block, "seconds": round(t3d, 4),
                          "steps_per_s": round(BATCH * NUM_STEPS / t3d),
                          "mean_2d": round(m2, 1), "mean_3d": round(m3, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
