"""Whole-episode Pallas kernels for Newsvendor and InvManagement.

Same design as the NetInvMgmt episode kernel (ops/pallas_net_step.py): the
env state lives in VMEM/registers across the ENTIRE statically-unrolled
horizon (every reference env truncates at a static step limit —
newsvendor.py:190, inventory_management.py:350), batch in the lane
dimension, topology/economic constants baked at trace time.

Two entry points per family:
- ``episode_returns_*``          — actions supplied as a pre-sampled stream
  (deterministic given inputs; pinned exactly against the XLA
  ``step_with_demand`` chain by tests/test_pallas_episode_kernels.py).
- ``episode_returns_*_random``   — the uniform-random benchmark policy
  sampled INSIDE the kernel by the TPU hardware PRNG
  (pltpu.prng_random_bits), eliminating the (T, B) action-stream HBM
  materialization. Same distribution as ``Box.sample``; different stream.

Demand stays pre-sampled by XLA in both forms (Poisson needs rejection
sampling; the streams are one row per period and cheap).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from or_gym_inventory_tpu.envs.inv_management import InvManagementParams
from or_gym_inventory_tpu.envs.newsvendor import NewsvendorParams


def _uniform01(shape):
    """In-kernel uniform [0, 1) from the hardware PRNG (24-bit mantissa).
    Mosaic has no uint32->f32 cast; the shifted value is positive, so the
    int32 bitcast is exact. Mosaic's bitcast also rejects 1D operands, so
    1D requests are padded to (1, n) and squeezed."""
    squeeze = len(shape) == 1
    shape2 = (1,) + tuple(shape) if squeeze else shape
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape2), jnp.uint32)
    u24 = jax.lax.shift_right_logical(bits, jnp.uint32(8))
    u = pltpu.bitcast(u24, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return u[0] if squeeze else u


# ============================================================== Newsvendor

def _nv_step_math(params: NewsvendorParams, P, price, cost, h, k,
                  order_raw, d):
    """One newsvendor period over (B,) vectors; event order per
    newsvendor.py:125-204 (see envs/newsvendor.py.step_with_demand)."""
    L = params.lead_time
    if L == 0:
        pipeline_sum = jnp.zeros_like(order_raw)
        inv_on_hand = order_raw  # reference quirk: pre-cap order on hand
    else:
        pipeline_sum = sum(P[1:], P[0])
        inv_on_hand = P[0]
    order_qty = jnp.maximum(0.0, jnp.minimum(
        order_raw, params.max_inventory - pipeline_sum))
    sales = jnp.minimum(inv_on_hand, d)
    excess = jnp.maximum(0.0, inv_on_hand - d)
    short = jnp.maximum(0.0, d - inv_on_hand)
    reward = sales * price - order_qty * cost - excess * h - short * k
    if L > 0:
        P = P[1:] + [order_qty]
    return P, reward


def _nv_kernel(params: NewsvendorParams, num_steps, in_kernel_actions,
               *refs):
    if in_kernel_actions:
        seed_ref, econ_ref, dems_ref, rew_ref = refs
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    else:
        econ_ref, acts_ref, dems_ref, rew_ref = refs
    price, cost, h, k = (econ_ref[i, :] for i in range(4))
    L = params.lead_time
    P = [jnp.zeros_like(price) for _ in range(L)]
    total = jnp.zeros_like(price)
    for t in range(num_steps):
        if in_kernel_actions:
            order_raw = _uniform01(price.shape) * params.max_order_quantity
        else:
            # pre-sampled stream; reference clips to [0, max_order]
            order_raw = jnp.clip(acts_ref[t, :], 0.0,
                                 params.max_order_quantity)
        P, reward = _nv_step_math(params, P, price, cost, h, k,
                                  order_raw, dems_ref[t, :])
        total = total + (params.gamma ** t) * reward
    rew_ref[0, :] = total


def _nv_call(params: NewsvendorParams, econ, streams, seed, block, interpret):
    num_steps = params.step_limit
    B = econ.shape[1]
    assert B % block == 0, (B, block)

    def spec(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    in_kernel = seed is not None
    kernel = partial(_nv_kernel, params, num_steps, in_kernel)
    in_specs = [spec(5)] + [spec(num_steps) for _ in streams]
    args = [econ] + list(streams)
    if in_kernel:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = [jnp.asarray(seed, jnp.int32).reshape(1)] + args
    out = pl.pallas_call(
        kernel, grid=(B // block,), in_specs=in_specs, out_specs=spec(1),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        interpret=interpret)(*args)
    return out[0]


def episode_returns_nv(params: NewsvendorParams, econ, actions, demands,
                       block: int = 1024, interpret: bool = False):
    """Episode returns for a lockstep batch, one kernel launch.

    ``econ`` (5, B) per-lane [p, c, h, k, mu] (mu unused in the kernel —
    demand is pre-sampled from it), ``actions``/``demands`` (num_steps, B)
    float32. Returns (B,) float32.
    """
    return _nv_call(params, econ, (actions, demands), None, block, interpret)


def episode_returns_nv_random(params: NewsvendorParams, econ, demands, seed,
                              block: int = 1024, interpret: bool = False):
    """Random-policy episode returns; actions sampled in-kernel
    (uniform [0, max_order_quantity), the Box.sample distribution)."""
    return _nv_call(params, econ, (demands,), seed, block, interpret)


# =========================================================== InvManagement

def _im_step_math(params: InvManagementParams, t, inv, bkl, RH, act, d):
    """One InvManagement period over lists of (B,) int32 vectors, event
    order per inventory_management.py:224-352 (see
    envs/inv_management.py.step_with_demand). ``RH`` is a newest-first list
    of lt_max*m1 fulfilled-order rows; ``t`` is static."""
    m1 = params.m1
    c = params.c
    L = params.L
    BIG = jnp.int32(1 << 30)

    # 0) orders: request = action + prior backlog of stages 1..m; caps
    r_req = [jnp.maximum(act[i], 0) for i in range(m1)]
    order_req = [r_req[i] + bkl[i + 1] for i in range(m1)]
    r_ful = []
    for i in range(m1):
        sup_inv = inv[i + 1] if i + 1 < m1 else BIG  # stage m: infinite raw
        r_ful.append(jnp.minimum(jnp.minimum(order_req[i],
                                             jnp.int32(c[i])), sup_inv))

    # 1) arrivals ordered L_i periods ago (static window reads)
    inv_cur = list(inv)
    for i in range(m1):
        li = int(L[i])
        if li == 0:
            due = r_ful[i]
        elif t >= li:
            due = RH[(li - 1) * m1 + i]
        else:
            due = jnp.zeros_like(r_ful[i])
        inv_cur[i] = inv_cur[i] + due

    # 2-3) retailer sales incl. prior backlog
    dem = jnp.maximum(d, 0)
    to_fill = dem + bkl[0]
    sales0 = jnp.minimum(inv_cur[0], to_fill)
    inv_cur[0] = inv_cur[0] - sales0

    # 4) supplier stages decremented by the orders they *placed* (reference
    # quirk, inventory_management.py:300); U = unfulfilled
    for i in range(1, m1):
        inv_cur[i] = inv_cur[i] - r_ful[i]
    S = [sales0] + r_ful                                  # (m,)
    U = [to_fill - sales0] + [order_req[i] - r_ful[i] for i in range(m1)]
    new_bkl = U if params.backlog else [jnp.zeros_like(u) for u in U]

    # 5) period profit
    up = params.unit_price   # np arrays of static floats
    uc = params.unit_cost
    hv = params.holding_cost_vec
    kv = params.k
    profit = jnp.zeros_like(sales0, dtype=jnp.float32)
    for i in range(params.num_stages):
        Sf = S[i].astype(jnp.float32)
        profit = profit + (float(up[i]) - float(uc[i])) * Sf
        profit = profit - float(kv[i]) * U[i].astype(jnp.float32)
        if i < m1:
            profit = profit - float(hv[i]) * jnp.maximum(
                0, inv_cur[i]).astype(jnp.float32)
    # history roll (newest-first)
    if params.lt_max > 0:
        RH = r_ful + RH[: (params.lt_max - 1) * m1]
    return inv_cur, new_bkl, RH, r_req, profit


def _im_kernel(params: InvManagementParams, num_steps, in_kernel_actions,
               *refs):
    if in_kernel_actions:
        seed_ref, dems_ref, rew_ref = refs
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    else:
        acts_ref, dems_ref, rew_ref = refs
    m1, lt = params.m1, params.lt_max
    B = dems_ref.shape[1]
    zero = jnp.zeros((B,), jnp.int32)
    inv = [jnp.full((B,), int(i0), jnp.int32) for i0 in params.I0]
    bkl = [zero for _ in range(params.num_stages)]
    RH = [zero for _ in range(lt * m1)]
    total = jnp.zeros((B,), jnp.float32)
    for t in range(num_steps):
        if in_kernel_actions:
            # inclusive uniform ints [0, c_i] — Box.sample int semantics
            u = _uniform01((m1, B))
            act = [jnp.minimum((u[i, :] * float(params.c[i] + 1)
                                ).astype(jnp.int32),
                               jnp.int32(params.c[i])) for i in range(m1)]
        else:
            act = [acts_ref[t * m1 + i, :] for i in range(m1)]
        inv, bkl, RH, _, profit = _im_step_math(
            params, t, inv, bkl, RH, act, dems_ref[t, :])
        total = total + (params.alpha ** t) * profit
    rew_ref[0, :] = total


def _im_call(params: InvManagementParams, streams, seed, block, interpret):
    num_steps = params.periods
    B = streams[-1].shape[-1]
    assert B % block == 0, (B, block)

    def spec(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    in_kernel = seed is not None
    kernel = partial(_im_kernel, params, num_steps, in_kernel)
    in_specs = [spec(s.shape[0]) for s in streams]
    args = list(streams)
    if in_kernel:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = [jnp.asarray(seed, jnp.int32).reshape(1)] + args
    out = pl.pallas_call(
        kernel, grid=(B // block,), in_specs=in_specs, out_specs=spec(1),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        interpret=interpret)(*args)
    return out[0]


def episode_returns_im(params: InvManagementParams, actions, demands,
                       block: int = 1024, interpret: bool = False):
    """Episode returns for a lockstep batch, one kernel launch.

    ``actions`` (num_steps, m1, B) int32 (raw requests; negatives clamp in
    the kernel like the reference), ``demands`` (num_steps, B) int32.
    Returns (B,) float32 discounted episode returns.
    """
    T, m1, B = actions.shape
    acts = actions.reshape(T * m1, B)
    return _im_call(params, (acts, demands), None, block, interpret)


def episode_returns_im_random(params: InvManagementParams, demands, seed,
                              block: int = 1024, interpret: bool = False):
    """Random-policy episode returns; inclusive uniform-int actions in
    [0, c_i] sampled in-kernel."""
    return _im_call(params, (demands,), seed, block, interpret)


# ------------------------- fully-fused InvManagement (in-kernel demand too)

def _invert_discrete_i32(u, base, table):
    """demand = base + #{F in table : F <= u} — exact CDF inversion against
    compile-time thresholds (ops/distributions.discrete_cdf_table)."""
    d = jnp.zeros(u.shape, jnp.int32)
    for F in table:
        d = d + (u >= F).astype(jnp.int32)
    return d + base if base else d


def _im_demand_spec(params: InvManagementParams):
    """(base, table) or, for USER mode, the per-period constant array."""
    from or_gym_inventory_tpu.ops import distributions as dist
    if params.dist == dist.USER:
        return None  # deterministic: user_D[t] baked per period
    return dist.discrete_cdf_table(params.dist, params.dist_param_dict)


def _im_sample_actions(params, tile):
    u = _uniform01((params.m1,) + tile)
    return [jnp.minimum((u[i] * float(params.c[i] + 1)).astype(jnp.int32),
                        jnp.int32(params.c[i])) for i in range(params.m1)]


def _im_sample_demand(params, tile, t, spec):
    if spec is None:  # USER: deterministic per period, no PRNG draw
        v = int(params.user_D[t]) if t < len(params.user_D) else 0
        return jnp.full(tile, v, jnp.int32)
    base, table = spec
    return _invert_discrete_i32(_uniform01(tile), base, table)


def _im_fused_kernel(params: InvManagementParams, num_steps, spec,
                     seed_ref, rew_ref):
    """Whole episode with actions AND demand sampled on-core; (rows, sub,
    128) native-tile layout (see ops/pallas_net_step.py — same design,
    measured there at 14.7x the pre-sampled round-1 path combined with the
    in-kernel demand)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    m1, lt = params.m1, params.lt_max
    tile = rew_ref.shape[1:]
    zero = jnp.zeros(tile, jnp.int32)
    inv = [jnp.full(tile, int(i0), jnp.int32) for i0 in params.I0]
    bkl = [zero for _ in range(params.num_stages)]
    RH = [zero for _ in range(lt * m1)]
    total = jnp.zeros(tile, jnp.float32)
    for t in range(num_steps):
        act = _im_sample_actions(params, tile)
        d = _im_sample_demand(params, tile, t, spec)
        inv, bkl, RH, _, profit = _im_step_math(
            params, t, inv, bkl, RH, act, d)
        total = total + (params.alpha ** t) * profit
    rew_ref[0] = total


def _im_streams_debug_kernel(params: InvManagementParams, num_steps, spec,
                             seed_ref, acts_ref, dems_ref):
    """Replays _im_fused_kernel's exact PRNG consumption order (per period:
    action draws then demand draw) and dumps both streams for pinning."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    m1 = params.m1
    tile = dems_ref.shape[1:]
    for t in range(num_steps):
        act = _im_sample_actions(params, tile)
        for i in range(m1):
            acts_ref[t * m1 + i] = act[i]
        dems_ref[t] = _im_sample_demand(params, tile, t, spec)


def episode_returns_im_fused(params: InvManagementParams, seed,
                             batch: int, block: int = 2048,
                             interpret: bool = False):
    """Random-policy episode returns with NO pre-materialized streams —
    uniform-int actions AND demand (all four stochastic reference dist
    modes, via exact compile-time CDF inversion; USER mode baked as
    per-period constants) sampled inside the kernel. Returns (batch,)."""
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    sub = block // 128
    spec = _im_demand_spec(params)
    kernel = partial(_im_fused_kernel, params, params.periods, spec)
    out = pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, sub, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, batch // 128, 128), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1))
    return out.reshape(batch)


def sample_streams_debug_im(params: InvManagementParams, seed, batch: int,
                            block: int = 2048, interpret: bool = False):
    """The exact action/demand streams episode_returns_im_fused consumes for
    ``seed`` (same ``block`` required — PRNG consumption is per-tile).
    Returns (actions (T, m1, batch) i32, demands (T, batch) i32)."""
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    sub = block // 128
    T, m1 = params.periods, params.m1
    spec = _im_demand_spec(params)
    kernel = partial(_im_streams_debug_kernel, params, T, spec)

    def ospec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    acts, dems = pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[ospec(T * m1), ospec(T)],
        out_shape=[
            jax.ShapeDtypeStruct((T * m1, batch // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((T, batch // 128, 128), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1))
    return (acts.reshape(T, m1, batch), dems.reshape(T, batch))
