"""Pallas fused kernel for the NetInvMgmt step.

The XLA path compiles one env period into ~150 small VPU ops whose
intermediates round-trip HBM between fusion boundaries (measured ~59 GB/s
effective at 262k envs — ~7% of v5e HBM peak; PERFORMANCE.md). This kernel
computes the ENTIRE period — sequential supplier contention, deliveries,
retail fulfillment, per-node profit — in one pallas_call with the state tile
resident in VMEM.

Layout: struct-of-rows with the **batch in the lane dimension** — state
arrays are (rows, B) so every vector op runs 128-wide regardless of how few
links/nodes the topology has. The grid partitions the batch; topology
constants (link tables, prices, lead times) are baked into the kernel at
trace time from the static Topology, exactly like the XLA path.

Semantics match envs/net_inv_management.step_with_demand exactly (same
reference event order, network_management.py:436-635); pinned by
tests/test_pallas_net_step.py against the XLA implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from or_gym_inventory_tpu.envs.net_inv_management import NetInvParams


def _step_math(T, backlog, X, Y, U, RH, act, dem, arrive_valid):
    """Pure per-period math over lists of (B,) vectors. ``RH`` is a list of
    lt*n_ro rows, newest-first; ``arrive_valid[i]`` multiplies the arrival of
    link i (1.0 iff t >= L_i). Returns (X', Y', U', r_cur, period_profit)."""
    n_main, n_ro, n_rt = T.n_main, T.n_reorder, T.n_retail

    # --- 0) order fulfillment with sequential supplier contention ---
    consumed = [jnp.zeros_like(X[0]) for _ in range(n_main)]
    r_cur = []
    for i in range(n_ro):
        req = jnp.maximum(0.0, jnp.round(act[i]))
        sup = T.ro_sup_main[i]
        if sup < 0:
            fulfilled = req
        else:
            remaining = X[sup] - consumed[sup]
            avail = jnp.maximum(0.0, remaining)
            if T.is_factory[sup]:
                avail = jnp.minimum(avail, jnp.minimum(T.C[sup], T.v[sup] * avail))
            fulfilled = jnp.minimum(req, avail)
            consumed[sup] = consumed[sup] + fulfilled / T.v[sup]
        r_cur.append(fulfilled)

    # --- 1) deliveries + pipeline ---
    arriving = []
    for i, L in enumerate(T.ro_L):
        if L == 0:
            arriving.append(r_cur[i])
        else:
            arriving.append(RH[(L - 1) * n_ro + i] * arrive_valid[i])
    Y_new = [Y[i] - arriving[i] + r_cur[i] for i in range(n_ro)]
    arrivals_node = [jnp.zeros_like(X[0]) for _ in range(n_main)]
    for i in range(n_ro):
        arrivals_node[T.ro_pur_main[i]] = arrivals_node[T.ro_pur_main[i]] + arriving[i]
    X_mid = [X[j] + arrivals_node[j] - consumed[j] for j in range(n_main)]

    # --- 2-4) sequential retail fulfillment ---
    sales_rt, U_new = [], []
    for j in range(n_rt):
        ret = T.rt_retailer_main[j]
        d = jnp.maximum(0.0, jnp.round(dem[j]))
        to_fill = d + U[j]
        inv_r = jnp.maximum(0.0, X_mid[ret])
        s = jnp.minimum(to_fill, inv_r)
        X_mid[ret] = X_mid[ret] - s
        sales_rt.append(s)
        unf = to_fill - s
        U_new.append(unf if backlog else jnp.zeros_like(unf))

    # --- 5) per-node profit ---
    zero = jnp.zeros_like(X[0])
    SR = [zero] * n_main
    PC = [zero] * n_main
    HCp = [zero] * n_main
    sold = [zero] * n_main
    for i in range(n_ro):
        sup, pur = T.ro_sup_main[i], T.ro_pur_main[i]
        rev = T.ro_price[i] * r_cur[i]
        if sup >= 0:
            SR[sup] = SR[sup] + rev
            sold[sup] = sold[sup] + r_cur[i]
        PC[pur] = PC[pur] + rev
        HCp[pur] = HCp[pur] + T.ro_g[i] * jnp.maximum(0.0, Y_new[i])
    UP = [zero] * n_main
    for j in range(n_rt):
        ret = T.rt_retailer_main[j]
        SR[ret] = SR[ret] + T.rt_price[j] * sales_rt[j]
        sold[ret] = sold[ret] + sales_rt[j]
        UP[ret] = UP[ret] + T.rt_b[j] * U_new[j]

    total = jnp.zeros_like(X[0])
    for n in range(n_main):
        HC = T.h[n] * jnp.maximum(0.0, X_mid[n]) + HCp[n]
        OC = (T.o[n] * sold[n] / T.v[n]) if T.is_factory[n] else zero
        total = total + (SR[n] - PC[n] - OC - HC - UP[n])
    return X_mid, Y_new, U_new, r_cur, total


def _kernel_body(T, backlog, n_main, n_ro, n_rt, lt,
                 X_ref, Y_ref, U_ref, RH_ref, act_ref, dem_ref, tmask_ref,
                 disc_ref,
                 Xo_ref, Yo_ref, Uo_ref, RHo_ref, rew_ref):
    """One period for a (rows, B_tile) state tile. ``T`` is the static
    Topology; tmask_ref[l] = 1.0 iff t >= ro_L[l] (arrival valid)."""
    X = [X_ref[i, :] for i in range(n_main)]
    Y = [Y_ref[i, :] for i in range(n_ro)]
    U = [U_ref[i, :] for i in range(n_rt)]
    RH = [RH_ref[r, :] for r in range(lt * n_ro)]
    act = [act_ref[i, :] for i in range(n_ro)]
    dem = [dem_ref[j, :] for j in range(n_rt)]
    valid = [tmask_ref[i, :] for i in range(n_ro)]

    X_mid, Y_new, U_new, r_cur, total = _step_math(
        T, backlog, X, Y, U, RH, act, dem, valid)
    rew_ref[0, :] = disc_ref[0, :] * total

    for n in range(n_main):
        Xo_ref[n, :] = X_mid[n]
    for i in range(n_ro):
        Yo_ref[i, :] = Y_new[i]
    for j in range(n_rt):
        Uo_ref[j, :] = U_new[j]
    # r_hist shift: newest first
    for i in range(n_ro):
        RHo_ref[i, :] = r_cur[i]
    for row in range(lt - 1):
        for i in range(n_ro):
            RHo_ref[(row + 1) * n_ro + i, :] = RH[row * n_ro + i]


def _episode_kernel_body(T, backlog, n_main, n_ro, n_rt, lt, num_steps, alpha,
                         X_ref, Y_ref, U_ref, RH_ref, acts_ref, dems_ref,
                         rew_ref):
    """Whole fixed-horizon episode in one kernel: the state lives in
    registers/VMEM across all ``num_steps`` periods (statically unrolled —
    the horizon is static in every reference env). ``acts_ref`` is
    (num_steps*n_ro, Bt), ``dems_ref`` (num_steps*n_rt, Bt); output is the
    discounted episode return per lane (1, Bt)."""
    X = [X_ref[i, :] for i in range(n_main)]
    Y = [Y_ref[i, :] for i in range(n_ro)]
    U = [U_ref[i, :] for i in range(n_rt)]
    RH = [RH_ref[r, :] for r in range(lt * n_ro)]
    total = jnp.zeros_like(X[0])
    one = jnp.ones_like(X[0])
    for t in range(num_steps):
        act = [acts_ref[t * n_ro + i, :] for i in range(n_ro)]
        dem = [dems_ref[t * n_rt + j, :] for j in range(n_rt)]
        valid = [one if t >= L else jnp.zeros_like(one) for L in T.ro_L]
        X, Y, U, r_cur, profit = _step_math(
            T, backlog, X, Y, U, RH, act, dem, valid)
        RH = r_cur + RH[: (lt - 1) * n_ro]
        total = total + (alpha ** t) * profit
    rew_ref[0, :] = total


def _episode_kernel_body_inkernel_actions(
        T, backlog, n_main, n_ro, n_rt, lt, num_steps, alpha, act_hi,
        seed_ref, X_ref, Y_ref, U_ref, RH_ref, dems_ref, rew_ref):
    """Whole-episode kernel that also SAMPLES the random actions on-core
    (pltpu.prng_random_bits) instead of streaming a pre-materialized
    (num_steps*n_ro, B) tensor from HBM. Actions are uniform [0, act_hi) —
    the same distribution as the XLA random policy, on the hardware PRNG
    stream (seeded per grid tile)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    X = [X_ref[i, :] for i in range(n_main)]
    Y = [Y_ref[i, :] for i in range(n_ro)]
    U = [U_ref[i, :] for i in range(n_rt)]
    RH = [RH_ref[r, :] for r in range(lt * n_ro)]
    total = jnp.zeros_like(X[0])
    one = jnp.ones_like(X[0])
    scale = act_hi / float(1 << 24)
    for t in range(num_steps):
        bits = pltpu.bitcast(
            pltpu.prng_random_bits((n_ro, X[0].shape[0])), jnp.uint32)
        u24 = jax.lax.shift_right_logical(bits, jnp.uint32(8))
        # Mosaic has no uint32->f32 cast; the 24-bit value is positive, so
        # bitcast to int32 first.
        acts = pltpu.bitcast(u24, jnp.int32).astype(jnp.float32) * scale
        act = [acts[i, :] for i in range(n_ro)]
        dem = [dems_ref[t * n_rt + j, :] for j in range(n_rt)]
        valid = [one if t >= L else jnp.zeros_like(one) for L in T.ro_L]
        X, Y, U, r_cur, profit = _step_math(
            T, backlog, X, Y, U, RH, act, dem, valid)
        RH = r_cur + RH[: (lt - 1) * n_ro]
        total = total + (alpha ** t) * profit
    rew_ref[0, :] = total


def _poisson_cdf_table(lam: float, granularity: float = 2.0 ** -24):
    """Poisson CDF values F(0..K-1) for compile-time inversion sampling.

    Computed in float64 on host (exact for lam <= ~700), truncated at the
    first K with P(X >= K) < ``granularity`` — below the resolution of the
    24-bit uniform the kernel inverts, so truncation is unobservable. The
    returned Python floats are baked into the kernel as constants (lam is
    static topology data, like every other Topology scalar)."""
    import numpy as np
    if lam <= 0.0:
        return (float("inf"),)  # demand identically 0
    p = float(np.exp(-lam))
    F = p
    table = [F]
    k = 0
    while 1.0 - F > granularity and k < 4096:
        k += 1
        p *= lam / k
        F += p
        table.append(F)
    # store as f32 the way the kernel compares them
    return tuple(float(np.float32(v)) for v in table)


def _topology_link_specs(T, num_steps):
    """Per-retail-link compile-time demand plan for the fused kernel.

    Every STATIC-parameter distribution the reference's per-edge demand
    surface supports (network_management.py:240-267) compiles to
    ``("table", base, thresholds)`` — exact CDF inversion of one in-kernel
    uniform against float64-computed thresholds
    (ops/distributions.cdf_table_for_spec: poisson / binomial / negbinomial
    / randint / geometric / rounded-clamped normal). Per-period
    DETERMINISTIC specs (``user`` array / ``zero``) become
    ``("const", per_period_values)`` — values baked as trace-time constants;
    the kernel still draws (and ignores) that link's uniform row so the
    PRNG stream layout is identical for every topology of the same shape.
    Only ``hostfn`` (an arbitrary host callable) cannot compile; it raises
    NotImplementedError, which the dispatcher turns into the loud XLA
    fallback (vector/fast_episodes.py).
    """
    from or_gym_inventory_tpu.ops import distributions as dist
    specs = []
    for spec in T.rt_demand:
        if spec[0] == "user":
            arr = tuple(float(v) for v in spec[1]) or (0.0,)
            specs.append(("const", tuple(arr[min(t, len(arr) - 1)]
                                         for t in range(num_steps))))
        elif spec[0] == "zero":
            specs.append(("const", (0.0,) * num_steps))
        else:
            specs.append(("table",) + dist.cdf_table_for_spec(spec))
    return tuple(specs)


def _uniform24(shape):
    """Uniform [0,1) f32 from the in-kernel hardware PRNG (24-bit mantissa;
    Mosaic has no uint32->f32 cast, so go through a positive int32)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u24 = jax.lax.shift_right_logical(bits, jnp.uint32(8))
    return pltpu.bitcast(u24, jnp.int32).astype(jnp.float32) * (2.0 ** -24)


def _invert_poisson(u_row, table):
    """demand = #{k : F(k) <= u} — exact CDF inversion, statically unrolled.

    The comparison thresholds are compile-time constants, so each table entry
    costs one vector compare + add on the VPU; K ~= lam + 6*sqrt(lam)."""
    d = jnp.zeros_like(u_row)
    for F in table:
        if F == float("inf"):
            break
        d = d + (u_row >= F).astype(jnp.float32)
    return d


def _link_demand(spec, u_row, t):
    """One retail link's period-``t`` demand from its compile-time plan
    (see _topology_link_specs) and the link's uniform row (ignored for
    deterministic const links)."""
    if spec[0] == "const":
        vals = spec[1]
        return jnp.full(u_row.shape, vals[min(t, len(vals) - 1)],
                        jnp.float32)
    _tag, base, table = spec
    d = _invert_poisson(u_row, table)
    return d + float(base) if base else d


def _episode_kernel_body_fully_fused(
        T, backlog, n_main, n_ro, n_rt, lt, num_steps, alpha, act_hi,
        link_specs, n_episodes, seed_ref, X_ref, Y_ref, U_ref, RH_ref,
        rew_ref):
    """Whole episode with BOTH streams generated on-core: uniform random
    actions AND demand (exact CDF inversion against compile-time tables for
    every static-parameter spec; per-period constants for user/zero links —
    see _topology_link_specs). Zero per-period HBM traffic — the roofline run
    (benchmarks/kernel_roofline.py) showed the XLA Poisson rejection sampler
    alone costs ~11x the episode kernel at 1M envs, so sampling in-kernel is
    the difference between ~71M and several hundred M steps/s.

    Refs are (rows, sub, 128): the batch tile is pre-shaped to native
    (8k, 128) f32 VPU tiles so every per-row vector op fills all sublanes —
    measured 1.4x over the (rows, B) layout (tools/layout_probe.py).

    Bit-exactness is pinned by sample_streams_debug: a kernel that replays
    the identical PRNG consumption order (per period: action bits, then
    demand bits) and dumps both streams, which fed to episode_returns must
    reproduce this kernel's returns exactly (tests/test_pallas_fused.py).

    ``n_episodes`` simulates that many INDEPENDENT episodes per lane (same
    initial state, disjoint PRNG draws), interleaved per period. The serial
    11-link contention chain is a semantics-imposed ILP ceiling for a single
    episode (PERFORMANCE.md "Utilization arithmetic"); E independent chains
    pipeline around it — measured E=2: 1.84x, E=4: 3.01x effective steps/s
    (tools/ilp_probe.py). n_episodes=1 draws the exact same PRNG stream as
    before the generalization."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    E = n_episodes
    X = [[X_ref[i] for i in range(n_main)] for _ in range(E)]
    Y = [[Y_ref[i] for i in range(n_ro)] for _ in range(E)]
    U = [[U_ref[i] for i in range(n_rt)] for _ in range(E)]
    RH = [[RH_ref[r] for r in range(lt * n_ro)] for _ in range(E)]
    tile = X_ref.shape[1:]
    total = [jnp.zeros(tile, jnp.float32) for _ in range(E)]
    one = jnp.ones(tile, jnp.float32)
    scale = act_hi / float(1 << 24)
    for t in range(num_steps):
        bits = pltpu.bitcast(pltpu.prng_random_bits((E * n_ro,) + tile),
                             jnp.uint32)
        u24 = jax.lax.shift_right_logical(bits, jnp.uint32(8))
        acts = pltpu.bitcast(u24, jnp.int32).astype(jnp.float32) * scale
        u = _uniform24((E * n_rt,) + tile)
        valid = [one if t >= L else jnp.zeros_like(one) for L in T.ro_L]
        for e in range(E):
            act = [acts[e * n_ro + i] for i in range(n_ro)]
            dem = [_link_demand(link_specs[j], u[e * n_rt + j], t)
                   for j in range(n_rt)]
            X[e], Y[e], U[e], r_cur, profit = _step_math(
                T, backlog, X[e], Y[e], U[e], RH[e], act, dem, valid)
            RH[e] = r_cur + RH[e][: (lt - 1) * n_ro]
            total[e] = total[e] + (alpha ** t) * profit
    for e in range(E):
        rew_ref[e] = total[e]


def _streams_debug_kernel_body(n_ro, n_rt, num_steps, act_hi, link_specs,
                               n_episodes, e0, e1, seed_ref, acts_ref,
                               dems_ref):
    """Replays the fused kernel's exact PRNG consumption order and writes the
    action/demand streams out (test/cross-check support). Same (rows, sub,
    128) layout as the fused kernel — the PRNG bit->lane assignment depends
    on the requested shape, so both kernels must draw identical shapes
    (including the episodes_per_lane-widened rows). ``[e0, e1)`` selects
    which episodes' streams are WRITTEN (all are drawn — consumption must
    match the fused kernel exactly); slicing keeps the dump buffers inside
    the VMEM budget at high interleave (E=16 full dump would need ~24 MB)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    E = n_episodes
    W = e1 - e0
    scale = act_hi / float(1 << 24)
    for t in range(num_steps):
        tile = acts_ref.shape[1:]
        bits = pltpu.bitcast(pltpu.prng_random_bits((E * n_ro,) + tile),
                             jnp.uint32)
        u24 = jax.lax.shift_right_logical(bits, jnp.uint32(8))
        acts = pltpu.bitcast(u24, jnp.int32).astype(jnp.float32) * scale
        for i in range(E * n_ro):
            if e0 * n_ro <= i < e1 * n_ro:
                acts_ref[t * W * n_ro + (i - e0 * n_ro)] = acts[i]
        u = _uniform24((E * n_rt,) + tile)
        for j in range(E * n_rt):
            if e0 * n_rt <= j < e1 * n_rt:
                dems_ref[t * W * n_rt + (j - e0 * n_rt)] = _link_demand(
                    link_specs[j % n_rt], u[j], t)


def episode_returns_fully_fused(params: NetInvParams, seed, act_hi: float,
                                batch: int, num_steps: int = None,
                                block: int = 2048, interpret: bool = False,
                                episodes_per_lane: int = 1):
    """Random-policy episode returns with NO pre-materialized streams: both
    the uniform actions and the demand are sampled inside the kernel
    (hardware PRNG + compile-time CDF inversion for every static-parameter
    retail spec; user/zero links baked as per-period constants). Only a
    ``hostfn`` link (arbitrary host callable) raises NotImplementedError.

    ``episodes_per_lane`` > 1 simulates that many independent episodes per
    lane in one launch (E independent dependency chains pipeline around the
    sequential-contention ILP ceiling — E=4 measures 3.0x effective
    throughput, tools/ilp_probe.py). Returns (batch,) for
    episodes_per_lane=1, else (episodes_per_lane, batch)."""
    T = params.topology
    n_main, n_ro, n_rt = T.n_main, T.n_reorder, T.n_retail
    lt = max(T.lt_max, 1)
    E = episodes_per_lane
    num_steps = params.num_periods if num_steps is None else num_steps
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    sub = block // 128
    link_specs = _topology_link_specs(T, num_steps)

    X, Y, U, RH = init_transposed(params, batch)
    shape3 = lambda rows: (rows, batch // 128, 128)

    def spec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    kernel = partial(_episode_kernel_body_fully_fused, T, params.backlog,
                     n_main, n_ro, n_rt, lt, num_steps, params.alpha,
                     float(act_hi), link_specs, E)
    out = pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec(n_main), spec(n_ro), spec(n_rt), spec(lt * n_ro)],
        out_specs=spec(E),
        out_shape=jax.ShapeDtypeStruct(shape3(E), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), X.reshape(shape3(n_main)),
      Y.reshape(shape3(n_ro)), U.reshape(shape3(n_rt)),
      RH.reshape(shape3(lt * n_ro)))
    return out.reshape(batch) if E == 1 else out.reshape(E, batch)


def sample_streams_debug(params: NetInvParams, seed, act_hi: float,
                         batch: int, num_steps: int = None,
                         block: int = 2048, interpret: bool = False,
                         episodes_per_lane: int = 1, dump_range=None):
    """The exact action/demand streams episode_returns_fully_fused consumes
    for ``seed`` — for pinning the fused kernel bit-exactly against
    episode_returns / the XLA step chain. Must be called with the same
    ``block`` and ``episodes_per_lane`` as the fused kernel (PRNG
    consumption is per-tile and widened by E). Returns
    (actions (num_steps, n_ro, batch), demands (num_steps, n_rt, batch))
    for episodes_per_lane=1, else with an extra E axis after num_steps.

    ``dump_range=(e0, e1)`` writes only that slice of the interleaved
    episodes (all streams are still drawn, so PRNG consumption matches the
    fused kernel); the returned E axis then has length e1-e0. Use it to
    cross-check high-E configurations whose full dump would exceed the
    per-tile VMEM budget (the fused kernel itself has no such buffer)."""
    T = params.topology
    n_ro, n_rt = T.n_reorder, T.n_retail
    E = episodes_per_lane
    e0, e1 = dump_range if dump_range is not None else (0, E)
    assert 0 <= e0 < e1 <= E, (e0, e1, E)
    W = e1 - e0
    num_steps = params.num_periods if num_steps is None else num_steps
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    sub = block // 128
    link_specs = _topology_link_specs(T, num_steps)
    shape3 = lambda rows: (rows, batch // 128, 128)

    def spec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    kernel = partial(_streams_debug_kernel_body, n_ro, n_rt, num_steps,
                     float(act_hi), link_specs, E, e0, e1)
    acts, dems = pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[spec(num_steps * W * n_ro), spec(num_steps * W * n_rt)],
        out_shape=[
            jax.ShapeDtypeStruct(shape3(num_steps * W * n_ro), jnp.float32),
            jax.ShapeDtypeStruct(shape3(num_steps * W * n_rt), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1))
    if E == 1:
        return (acts.reshape(num_steps, n_ro, batch),
                dems.reshape(num_steps, n_rt, batch))
    return (acts.reshape(num_steps, W, n_ro, batch),
            dems.reshape(num_steps, W, n_rt, batch))


# --------------------- policy-in-kernel NetInvMgmt (MXU actor, MLP eval)

def _net_obs_rows(T, X, U, RH):
    """The reference observation as a list of tile rows: U[t] per retail
    link, X[t] per main node, then each reorder link's chronological
    order window R[t-L..t-1] (network_management.py:334-413 — the
    newest-first RH ring read oldest-first; rows beyond period t are the
    ring's zero-initialized slots, matching the XLA zeros-at-front)."""
    rows = list(U) + list(X)
    n_ro = T.n_reorder
    for i, L in enumerate(T.ro_L):
        for j in range(L):
            rows.append(RH[(L - 1 - j) * n_ro + i])
    return rows


def _episode_kernel_body_policy(
        T, backlog, n_main, n_ro, n_rt, lt, num_steps, alpha, act_hi,
        link_specs, act_name, precision, n_layers, n_episodes, dump_streams,
        stochastic, *refs):
    """Whole episode under a fused MLP policy (deterministic, or with
    in-kernel Gaussian exploration when ``stochastic``; same design as
    ops/pallas_episode_kernels.episode_returns_im_policy — obs assembled in
    VMEM from live state, trunk as MXU matmuls, tanh-squash to the action
    box [0, act_hi], demand from the compile-time link tables)."""
    from or_gym_inventory_tpu.ops.pallas_episode_kernels import (_normal01,
                                                                 mlp_forward)
    seed_ref = refs[0]
    Ws_refs = refs[1:1 + n_layers]
    bs_refs = refs[1 + n_layers:1 + 2 * n_layers]
    off = 2 + 2 * n_layers if stochastic else 1 + 2 * n_layers
    std_ref = refs[off - 1] if stochastic else None
    X_ref, Y_ref, U_ref, RH_ref = refs[off:off + 4]
    outs = refs[off + 4:]
    if dump_streams:
        rew_ref, acts_ref, dems_ref = outs
    else:
        rew_ref, = outs
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    E = n_episodes
    X = [[X_ref[i] for i in range(n_main)] for _ in range(E)]
    Y = [[Y_ref[i] for i in range(n_ro)] for _ in range(E)]
    U = [[U_ref[i] for i in range(n_rt)] for _ in range(E)]
    RH = [[RH_ref[r] for r in range(lt * n_ro)] for _ in range(E)]
    tile = X_ref.shape[1:]
    total = [jnp.zeros(tile, jnp.float32) for _ in range(E)]
    one = jnp.ones(tile, jnp.float32)
    for t in range(num_steps):
        u = _uniform24((E * n_rt,) + tile)
        valid = [one if t >= L else jnp.zeros_like(one) for L in T.ro_L]
        for e in range(E):
            H = mlp_forward(Ws_refs, bs_refs, act_name, precision,
                            _net_obs_rows(T, X[e], U[e], RH[e]))
            if std_ref is not None:
                H = H + std_ref[...] * _normal01(H.shape)
            # squash to [0, act_hi] (low = 0, scalar high for every link —
            # network env action box, net_inv_management.action_space)
            S = (jnp.tanh(H) + 1.0) * (0.5 * act_hi)
            act = [S[i:i + 1].reshape(tile) for i in range(n_ro)]
            dem = [_link_demand(link_specs[j], u[e * n_rt + j], t)
                   for j in range(n_rt)]
            X[e], Y[e], U[e], r_cur, profit = _step_math(
                T, backlog, X[e], Y[e], U[e], RH[e], act, dem, valid)
            RH[e] = r_cur + RH[e][: (lt - 1) * n_ro]
            total[e] = total[e] + (alpha ** t) * profit
            if dump_streams:
                for i in range(n_ro):
                    acts_ref[(t * E + e) * n_ro + i] = act[i]
                for j in range(n_rt):
                    dems_ref[(t * E + e) * n_rt + j] = dem[j]
    for e in range(E):
        rew_ref[e] = total[e]


def _net_policy_call(params, actor, seed, batch, block, episodes_per_lane,
                     dump_streams, interpret, precision, log_std=None):
    T = params.topology
    n_main, n_ro, n_rt = T.n_main, T.n_reorder, T.n_retail
    lt = max(T.lt_max, 1)
    E = episodes_per_lane
    num_steps = params.num_periods
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    sub = block // 128
    link_specs = _topology_link_specs(T, num_steps)
    act_hi = float(T.order_cap_heuristic * 2)
    Ws, bs = actor
    kernel = partial(_episode_kernel_body_policy, T, params.backlog, n_main,
                     n_ro, n_rt, lt, num_steps, params.alpha, act_hi,
                     link_specs, "tanh", precision, len(Ws), E, dump_streams,
                     log_std is not None)

    X, Y, U, RH = init_transposed(params, batch)
    shape3 = lambda rows: (rows, batch // 128, 128)

    def spec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def wspec(a):
        shp = tuple(a.shape)
        return pl.BlockSpec(shp, lambda i, _n=len(shp): (0,) * _n,
                            memory_space=pltpu.VMEM)

    out_rows = [E] + ([num_steps * E * n_ro, num_steps * E * n_rt]
                      if dump_streams else [])
    out_specs = [spec(r) for r in out_rows]
    out_shape = [jax.ShapeDtypeStruct(shape3(r), jnp.float32)
                 for r in out_rows]
    if not dump_streams:
        out_specs, out_shape = out_specs[0], out_shape[0]
    Ws2 = [w.T for w in Ws]                # kernel wants (out, in)
    bs2 = [b.reshape(-1, 1) for b in bs]   # (out, 1): lane-broadcastable
    from or_gym_inventory_tpu.ops.pallas_episode_kernels import clipped_std
    extra = []
    if log_std is not None:
        extra.append(clipped_std(log_std))
    return pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [wspec(w) for w in Ws2] + [wspec(b) for b in bs2]
        + [wspec(a) for a in extra]
        + [spec(n_main), spec(n_ro), spec(n_rt), spec(lt * n_ro)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), *Ws2, *bs2, *extra,
      X.reshape(shape3(n_main)), Y.reshape(shape3(n_ro)),
      U.reshape(shape3(n_rt)), RH.reshape(shape3(lt * n_ro)))


def episode_returns_net_policy(params: NetInvParams, actor, seed,
                               batch: int, block: int = 1024,
                               interpret: bool = False,
                               episodes_per_lane: int = 1, precision=None,
                               log_std=None):
    """Learned-policy episode returns for the network env, policy fused
    in-kernel (see episode_returns_im_policy — same recipe; ``actor`` from
    ops.pallas_episode_kernels.fold_actor_params). Demand from the
    compile-time link tables (hostfn raises). Deterministic by default;
    pass the trained ``log_std`` for stochastic evaluation (in-kernel
    Box-Muller exploration noise). Returns (batch,) for
    episodes_per_lane=1, else (episodes_per_lane, batch)."""
    E = episodes_per_lane
    out = _net_policy_call(params, actor, seed, batch, block, E, False,
                           interpret, precision, log_std)
    return out.reshape(batch) if E == 1 else out.reshape(E, batch)


def _net_traj_kernel(T, backlog, n_main, n_ro, n_rt, lt, num_steps, alpha,
                     act_hi, link_specs, act_name, policy_mode, precision,
                     n_layers, *refs):
    """NetInvMgmt trajectory-emitting rollout (the network-family analogue
    of ops/pallas_episode_kernels._im_traj_kernel): stochastic MLP actor
    on the MXU, per-link demand from the compile-time tables, dumping the
    training streams — start-of-period X/U ((T+1) snapshots), fulfilled
    orders r_cur, pre-squash raws, alpha^t-discounted rewards (env
    semantics) and demand."""
    from or_gym_inventory_tpu.ops.pallas_episode_kernels import traj_policy
    seed_ref = refs[0]
    Ws_refs = refs[1:1 + n_layers]
    bs_refs = refs[1 + n_layers:1 + 2 * n_layers]
    std_ref = refs[1 + 2 * n_layers]
    X_ref, Y_ref, U_ref, RH_ref = refs[2 + 2 * n_layers:6 + 2 * n_layers]
    xo_ref, uo_ref, ro_ref, raw_ref, rew_ref, dem_ref = \
        refs[6 + 2 * n_layers:]
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    X = [X_ref[i] for i in range(n_main)]
    Y = [Y_ref[i] for i in range(n_ro)]
    U = [U_ref[i] for i in range(n_rt)]
    RH = [RH_ref[r] for r in range(lt * n_ro)]
    tile = X_ref.shape[1:]
    one = jnp.ones(tile, jnp.float32)
    for t in range(num_steps):
        u = _uniform24((n_rt,) + tile)
        valid = [one if t >= L else jnp.zeros_like(one) for L in T.ro_L]
        for i in range(n_main):
            xo_ref[t * n_main + i] = X[i]
        for j in range(n_rt):
            uo_ref[t * n_rt + j] = U[j]
        store, a_norm = traj_policy(policy_mode, act_name, n_ro, Ws_refs,
                                    bs_refs, std_ref, precision,
                                    _net_obs_rows(T, X, U, RH))
        S = (a_norm + 1.0) * (0.5 * act_hi)
        act = []
        for i in range(n_ro):
            raw_ref[t * n_ro + i] = store[i:i + 1].reshape(tile)
            act.append(S[i:i + 1].reshape(tile))
        dem = [_link_demand(link_specs[j], u[j], t) for j in range(n_rt)]
        X, Y, U, r_cur, profit = _step_math(
            T, backlog, X, Y, U, RH, act, dem, valid)
        RH = r_cur + RH[: (lt - 1) * n_ro]
        for i in range(n_ro):
            ro_ref[t * n_ro + i] = r_cur[i]
        for j in range(n_rt):
            dem_ref[t * n_rt + j] = dem[j]
        rew_ref[t] = (alpha ** t) * profit
    for i in range(n_main):       # final snapshots: the bootstrap obs
        xo_ref[num_steps * n_main + i] = X[i]
    for j in range(n_rt):
        uo_ref[num_steps * n_rt + j] = U[j]


def rollout_traj_net(params: NetInvParams, actor, log_std, seed,
                     batch: int, block: int = 1024,
                     interpret: bool = False, precision=None,
                     policy: str = "ppo", act_name: str = "tanh"):
    """One full stochastic-policy network-env episode per lane with the
    training streams written to HBM. Returns a dict of float32 arrays:
    ``x (T+1, n_main, batch)`` / ``u (T+1, n_rt, batch)`` start-of-period
    node inventories and retail backlogs (final snapshots last),
    ``r (T, n_ro, batch)`` fulfilled orders (the obs window stream),
    ``raw (T, n_ro, batch)`` pre-squash Gaussian samples,
    ``reward (T, batch)`` (alpha^t-discounted, env semantics),
    ``demand (T, n_rt, batch)``. Consumed by
    ``PPOConfig(rollout="kernel")`` on the network family; raises
    NotImplementedError for hostfn demand links (loud fallback).
    ``policy``/``act_name`` select the in-kernel policy head
    (pallas_episode_kernels.traj_policy — off-policy collection modes
    dump the normalized [-1, 1] action stream in the ``raw`` slot)."""
    T_ = params.topology
    n_main, n_ro, n_rt = T_.n_main, T_.n_reorder, T_.n_retail
    lt = max(T_.lt_max, 1)
    num_steps = params.num_periods
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    sub = block // 128
    link_specs = _topology_link_specs(T_, num_steps)
    act_hi = float(T_.order_cap_heuristic * 2)
    Ws, bs = actor
    kernel = partial(_net_traj_kernel, T_, params.backlog, n_main, n_ro,
                     n_rt, lt, num_steps, params.alpha, act_hi, link_specs,
                     act_name, policy, precision, len(Ws))

    X, Y, U, RH = init_transposed(params, batch)
    shape3 = lambda rows: (rows, batch // 128, 128)

    def spec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def wspec(a):
        shp = tuple(a.shape)
        return pl.BlockSpec(shp, lambda i, _n=len(shp): (0,) * _n,
                            memory_space=pltpu.VMEM)

    out_rows = [(num_steps + 1) * n_main, (num_steps + 1) * n_rt,
                num_steps * n_ro, num_steps * n_ro, num_steps,
                num_steps * n_rt]
    Ws2 = [w.T for w in Ws]
    bs2 = [b.reshape(-1, 1) for b in bs]
    from or_gym_inventory_tpu.ops.pallas_episode_kernels import clipped_std
    std = clipped_std(log_std)
    xo, uo, ro, raw, rew, dem = pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [wspec(w) for w in Ws2] + [wspec(b) for b in bs2] + [wspec(std)]
        + [spec(n_main), spec(n_ro), spec(n_rt), spec(lt * n_ro)],
        out_specs=[spec(r) for r in out_rows],
        out_shape=[jax.ShapeDtypeStruct(shape3(r), jnp.float32)
                   for r in out_rows],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), *Ws2, *bs2, std,
      X.reshape(shape3(n_main)), Y.reshape(shape3(n_ro)),
      U.reshape(shape3(n_rt)), RH.reshape(shape3(lt * n_ro)))
    Tn = num_steps
    return dict(x=xo.reshape(Tn + 1, n_main, batch),
                u=uo.reshape(Tn + 1, n_rt, batch),
                r=ro.reshape(Tn, n_ro, batch),
                raw=raw.reshape(Tn, n_ro, batch),
                reward=rew.reshape(Tn, batch),
                demand=dem.reshape(Tn, n_rt, batch))


def sample_policy_streams_debug_net(params: NetInvParams, actor, seed,
                                    batch: int, block: int = 1024,
                                    interpret: bool = False,
                                    episodes_per_lane: int = 1,
                                    precision=None, log_std=None):
    """(returns, actions (T, E, n_ro, batch) f32, demands (T, E, n_rt,
    batch) f32) — the exact streams the policy kernel produced/consumed
    (identical PRNG consumption: demand, plus the per-period noise draws
    when ``log_std`` is given)."""
    T_, E = params.num_periods, episodes_per_lane
    n_ro, n_rt = params.topology.n_reorder, params.topology.n_retail
    rew, acts, dems = _net_policy_call(params, actor, seed, batch, block, E,
                                       True, interpret, precision, log_std)
    rew = rew.reshape(batch) if E == 1 else rew.reshape(E, batch)
    return (rew, acts.reshape(T_, E, n_ro, batch),
            dems.reshape(T_, E, n_rt, batch))


def batched_step(params: NetInvParams, X, Y, U, RH, action, demand, t,
                 block: int = 2048, interpret: bool = False):
    """One fused period over a transposed batch.

    Shapes (rows, B): X (n_main, B), Y (n_reorder, B), U (n_retail, B),
    RH (lt_max*n_reorder, B) newest-first, action (n_reorder, B),
    demand (n_retail, B); t is a scalar int32 (same for the lockstep batch).
    Returns (X', Y', U', RH', reward (B,)).
    """
    T = params.topology
    n_main, n_ro, n_rt = T.n_main, T.n_reorder, T.n_retail
    lt = max(T.lt_max, 1)
    B = X.shape[1]
    assert B % block == 0, (B, block)
    grid = (B // block,)

    # broadcast per-link arrival validity and the period discount to rows
    tmask = (t >= jnp.asarray(T.ro_L, jnp.int32)[:, None]).astype(jnp.float32)
    tmask = jnp.broadcast_to(tmask, (n_ro, B))
    disc = jnp.broadcast_to(
        (params.alpha ** t.astype(jnp.float32))[None, None], (1, B))

    def spec(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    kernel = partial(_kernel_body, T, params.backlog, n_main, n_ro, n_rt, lt)
    out_shape = [
        jax.ShapeDtypeStruct((n_main, B), jnp.float32),
        jax.ShapeDtypeStruct((n_ro, B), jnp.float32),
        jax.ShapeDtypeStruct((n_rt, B), jnp.float32),
        jax.ShapeDtypeStruct((lt * n_ro, B), jnp.float32),
        jax.ShapeDtypeStruct((1, B), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(n_main), spec(n_ro), spec(n_rt), spec(lt * n_ro),
                  spec(n_ro), spec(n_rt), spec(n_ro), spec(1)],
        out_specs=[spec(n_main), spec(n_ro), spec(n_rt), spec(lt * n_ro),
                   spec(1)],
        out_shape=out_shape,
        interpret=interpret,
    )(X, Y, U, RH, action, demand, tmask, disc)


def episode_returns(params: NetInvParams, actions, demands,
                    block: int = 512, interpret: bool = False):
    """Discounted episode returns for a lockstep batch, one kernel launch.

    ``actions`` (num_steps, n_reorder, B), ``demands`` (num_steps, n_retail,
    B) are pre-sampled streams (two XLA sampling ops); the episode itself —
    state recurrence and all — runs inside a single statically-unrolled
    Pallas kernel with zero intermediate HBM state traffic. Returns (B,).
    """
    T = params.topology
    n_main, n_ro, n_rt = T.n_main, T.n_reorder, T.n_retail
    lt = max(T.lt_max, 1)
    num_steps, _, B = actions.shape
    assert B % block == 0, (B, block)

    X, Y, U, RH = init_transposed(params, B)
    acts = actions.reshape(num_steps * n_ro, B)
    dems = demands.reshape(num_steps * n_rt, B)

    def spec(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    kernel = partial(_episode_kernel_body, T, params.backlog, n_main, n_ro,
                     n_rt, lt, num_steps, params.alpha)
    out = pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[spec(n_main), spec(n_ro), spec(n_rt), spec(lt * n_ro),
                  spec(num_steps * n_ro), spec(num_steps * n_rt)],
        out_specs=spec(1),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        interpret=interpret,
    )(X, Y, U, RH, acts, dems)
    return out[0]


def episode_returns_random_policy(params: NetInvParams, demands, seed,
                                  act_hi: float, block: int = 1024,
                                  interpret: bool = False):
    """Like ``episode_returns`` under a uniform-random policy, but the action
    stream is generated inside the kernel by the TPU hardware PRNG — no
    (num_steps, n_reorder, B) HBM materialization. ``demands`` is
    (num_steps, n_retail, B) (pre-sampled: Poisson needs rejection sampling,
    and the default topology has a single retail link so the stream is
    cheap); ``seed`` is an int32 scalar array. Returns (B,)."""
    T = params.topology
    n_main, n_ro, n_rt = T.n_main, T.n_reorder, T.n_retail
    lt = max(T.lt_max, 1)
    num_steps, _, B = demands.shape
    assert B % block == 0, (B, block)

    X, Y, U, RH = init_transposed(params, B)
    dems = demands.reshape(num_steps * n_rt, B)

    def spec(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    kernel = partial(_episode_kernel_body_inkernel_actions, T, params.backlog,
                     n_main, n_ro, n_rt, lt, num_steps, params.alpha,
                     float(act_hi))
    out = pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec(n_main), spec(n_ro), spec(n_rt), spec(lt * n_ro),
                  spec(num_steps * n_rt)],
        out_specs=spec(1),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), X, Y, U, RH, dems)
    return out[0]


def init_transposed(params: NetInvParams, batch: int):
    """Reset state in the kernel's (rows, B) layout."""
    T = params.topology
    lt = max(T.lt_max, 1)
    X = jnp.broadcast_to(jnp.asarray(T.I0, jnp.float32)[:, None],
                         (T.n_main, batch))
    Y = jnp.zeros((T.n_reorder, batch), jnp.float32)
    U = jnp.zeros((T.n_retail, batch), jnp.float32)
    RH = jnp.zeros((lt * T.n_reorder, batch), jnp.float32)
    return X, Y, U, RH


def rollout_transposed(params: NetInvParams, key: jax.Array, batch: int,
                       num_steps: int, action_value: float = None,
                       block: int = 2048, interpret: bool = False):
    """Random-action rollout through the fused kernel; returns summed reward
    (the benchmark workload of bench.py, on the Pallas path)."""
    T = params.topology
    hi = T.order_cap_heuristic * 2
    X, Y, U, RH = init_transposed(params, batch)

    def body(carry, t):
        X, Y, U, RH, key = carry
        akey, dkey, key = jax.random.split(key, 3)
        if action_value is None:
            action = jax.random.uniform(akey, (T.n_reorder, batch),
                                        minval=0.0, maxval=hi)
        else:
            action = jnp.full((T.n_reorder, batch), action_value)
        # every named spec via the env's device sampler (raises for hostfn
        # rather than silently benchmarking zero demand)
        from or_gym_inventory_tpu.envs import net_inv_management as _net
        demand = jax.vmap(lambda k: _net.sample_demand(params, k, t),
                          out_axes=1)(jax.random.split(dkey, batch))
        X, Y, U, RH, rew = batched_step(params, X, Y, U, RH, action, demand,
                                        t, block=block, interpret=interpret)
        return (X, Y, U, RH, key), jnp.sum(rew)

    (X, Y, U, RH, _), rewards = jax.lax.scan(
        body, (X, Y, U, RH, key), jnp.arange(num_steps))
    return jnp.sum(rewards)
