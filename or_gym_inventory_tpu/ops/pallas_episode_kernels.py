"""Whole-episode Pallas kernels for Newsvendor and InvManagement.

Same design as the NetInvMgmt episode kernel (ops/pallas_net_step.py): the
env state lives in VMEM/registers across the ENTIRE statically-unrolled
horizon (every reference env truncates at a static step limit —
newsvendor.py:190, inventory_management.py:350), batch in the lane
dimension, topology/economic constants baked at trace time.

Entry points per family (each a further-fused step of the same design):
- ``episode_returns_*``          — actions supplied as a pre-sampled stream
  (deterministic given inputs; pinned exactly against the XLA
  ``step_with_demand`` chain by tests/test_pallas_episode_kernels.py).
- ``episode_returns_*_random``   — the uniform-random benchmark policy
  sampled INSIDE the kernel by the TPU hardware PRNG
  (pltpu.prng_random_bits). Same distribution as ``Box.sample``;
  different stream.
- ``episode_returns_*_fused`` / ``_reset_fused`` — demand (and for
  newsvendor the reset economics) sampled in-kernel too: zero
  per-period HBM traffic, ``episodes_per_lane`` ILP interleave.
- ``episode_returns_im_policy``  — a deterministic learned MLP actor fused
  in-kernel as MXU matmuls (see the policy-in-kernel section below).

Every in-kernel-PRNG kernel has a ``sample_streams_debug*`` twin that
replays its exact PRNG consumption order and dumps the streams, so the
fused paths pin bit-exactly against the pre-materialized kernels and the
XLA step chain (tests/test_pallas_fused.py, tests/test_pallas_policy.py).
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


def _normal01(shape):
    """In-kernel standard normals: Box-Muller over two `_uniform01` draws.

    ``r = sqrt(-2 ln(1 - u1))`` (1 - u1 is in (0, 1] exactly for 24-bit
    uniforms, so the log never sees 0; the radius caps at
    sqrt(48 ln 2) ~ 5.77 — the tail truncation matches the uniform's
    2^-24 resolution, the same convention as the CDF-inversion samplers)
    and ``z = r cos(2 pi u2)``. Consumes exactly two PRNG draws of
    ``shape`` (u1 then u2) — streams-debug kernels replay this order.
    The sine twin is deliberately unused: one extra transcendental per
    draw buys stream-replay simplicity (every normal is a pure function
    of its own two uniforms, independent of the request's shape
    factorization)."""
    u1 = _uniform01(shape)
    u2 = _uniform01(shape)
    r = jnp.sqrt(-2.0 * jnp.log(1.0 - u1))
    return r * jnp.cos((2.0 * 3.14159265358979323846) * u2)


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
    return P, reward, order_qty


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
        P, reward, _q = _nv_step_math(params, P, price, cost, h, k,
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


# ------------------------------ fully-fused Newsvendor (in-kernel demand)
#
# Newsvendor demand is Poisson(mu) with mu drawn PER EPISODE at reset
# (reference newsvendor.py:111,146) — mu is dynamic per lane, so the static
# compile-time CDF tables used by the NetInvMgmt/InvManagement fused kernels
# do not apply. The kernel instead inverts the CDF with a per-lane running-pmf
# recurrence, exploiting two structural facts:
#
# 1. mu is CONSTANT across the episode, so the pmf recurrence over k is
#    computed once per lane and shared by every period's inversion — the
#    per-k cost is ~4 ops of recurrence plus 3 ops per period of compare
#    (amortized: ~K*(4/T + 3) ops per demand sample instead of ~5K).
# 2. Anchoring the recurrence at kc = floor(mu) + O(sqrt(mu)) keeps every
#    pmf value within f32 range for all mu <= mu_max (pmf(kc) >= pmf(mode) *
#    exp(-Z^2/2) ~ 1e-10 at Z=5.75), avoiding the exp(-mu) underflow that
#    rules out the textbook from-zero recurrence beyond mu ~ 87.
#
# The accumulation runs in SURVIVAL form, DESCENDING from a per-lane upper
# cutoff kc = floor(mu) + w(mu): the suffix sum S(k) = sum_{j>k} pmf(j) is
# built smallest-terms-first, so the right tail is resolved to full f32
# RELATIVE precision (a left-to-right CDF sum saturates ~7e-5 below 1 and
# cannot place far-tail thresholds at all), and the comparison target
# v = 1 - u is exact in f32 for a 24-bit uniform. The count identity is
#   d = #{k : F(k) <= u} = kc + 1 - #{k in window : S(k) < v},
# with k below the window contributing nothing (their computed S equals the
# full truncated mass, and a final max(d, 0) handles u below the truncated
# left tail). pmf(kc) = exp(kc*log(mu) - mu - lgamma(kc+1)); lgamma(kc+1) is
# selected from float64-exact compile-time constants by a masked update (kc
# is integer-valued), so the only in-kernel transcendentals are one
# log/sqrt/exp per episode. Demand clamps to [0, kc] (truncated tail mass
# ~2^-24 each side, the 24-bit uniform's resolution — the same truncation
# semantics as the static tables, tests/test_pallas_fused.py).

_NV_TAIL_Z = 5.75    # one-sided normal tail ~4.5e-9 at Z=5.75
_NV_TAIL_PAD = 6     # absolute slack on top of Z*sqrt(mu) (small-mu skew)


def _nv_window(params: NewsvendorParams):
    """(Wb, K, lgamma_consts): worst-case half-width, total unrolled terms,
    and float64-exact lgamma(k+1) for every reachable cutoff kc."""
    import math
    mu_max = max(float(params.mu_max), 1.0)
    Wb = int(math.ceil(_NV_TAIL_Z * math.sqrt(mu_max))) + _NV_TAIL_PAD
    K = 2 * Wb + 1
    kc_max = int(math.floor(mu_max)) + Wb
    lgam = tuple(float(math.lgamma(k + 1)) for k in range(kc_max + 1))
    return Wb, K, lgam


def _nv_poisson_setup(params: NewsvendorParams, mu):
    """Per-episode inversion anchor: (mu_safe, kc, pmf(kc), t_total) — pure
    jnp math, shared verbatim by the kernel and the CPU-testable mirror."""
    Wb, _K, lgam = _nv_window(params)
    mu_safe = jnp.maximum(mu.astype(jnp.float32), 1e-6)
    # absolute pad shrinks with mu: at tiny mu a +6 cutoff would put pmf(kc)
    # ~ mu^6 below the f32 subnormal floor and zero out the whole recurrence;
    # 2 + 4*min(mu,1) keeps pmf(kc) representable while the tail beyond kc
    # stays < 2^-24 (pinned across the mu grid by
    # test_cutoff_tail_mass_below_uniform_resolution)
    pad = 2.0 + 4.0 * jnp.minimum(mu_safe, 1.0)
    w = jnp.ceil(_NV_TAIL_Z * jnp.sqrt(mu_safe) + pad)
    kc = jnp.floor(mu_safe) + jnp.minimum(w, float(Wb))
    # The exponent g = kc*log(mu) - mu - lgamma(kc+1) is an O(1) result of
    # ~1e3-magnitude terms; naive f32 evaluation loses ~1e-4 to cancellation,
    # which scales EVERY pmf and corrupts the left-tail thresholds. Keep the
    # big terms in hi/lo pairs: lgamma constants are float64-exact splits
    # (masked update — kc is integer-valued, lgamma increasing), kc*log(mu)
    # is an exact product of kc (<=2^9) with a 12-bit Veltkamp head, and the
    # cancelling subtractions carry TwoSum error terms. Residual error
    # ~1e-6, i.e. sub-2^-24-resolution on the uniform scale.
    lg_hi = jnp.zeros_like(mu_safe)
    lg_lo = jnp.zeros_like(mu_safe)
    import numpy as _np
    for kk in range(2, len(lgam)):
        hi = _np.float32(lgam[kk])
        lo = _np.float32(lgam[kk] - float(hi))
        sel = kc >= float(kk)
        lg_hi = jnp.where(sel, hi, lg_hi)
        lg_lo = jnp.where(sel, lo, lg_lo)
    logmu = jnp.log(mu_safe)
    s = logmu * 4097.0                      # Veltkamp split: 12-bit head
    head = s - (s - logmu)
    tail = logmu - head
    a1 = kc * head                          # exact: 9 + 12 bits < 24
    A = a1 - lg_hi                          # TwoSum-compensated cancels
    t1 = A - a1
    e1 = (a1 - (A - t1)) - (lg_hi + t1)
    B = A - mu_safe
    t2 = B - A
    e2 = (A - (B - t2)) - (mu_safe + t2)
    g = B + (e1 + e2 + kc * tail - lg_lo)
    p_c = jnp.exp(g)
    # Renormalization total: one u-independent pass of the same recurrence.
    # Comparisons run against v * t_total, making the inversion invariant to
    # any uniform scale error left in p_c (f32 log(mu) rounds at ~1 ulp and
    # kc amplifies it ~2e-5 — with the total in the comparison that scale
    # cancels exactly; only intra-recurrence drift ~1e-6 remains).
    _K = 2 * Wb + 1
    p, T, comp, kf = p_c, jnp.zeros_like(p_c), jnp.zeros_like(p_c), kc
    for _ in range(_K):
        y = p - comp
        t_new = T + y
        comp = (t_new - T) - y
        T = t_new
        p = p * (kf / mu_safe)
        kf = kf - 1.0
    return mu_safe, kc, p_c, T


def _nv_poisson_invert(mu_safe, kc, p_c, t_total, K, us):
    """demand_i = #{k : F(k) <= u_i} for each uniform in ``us`` — one shared
    descending suffix-sum recurrence, per-u compare-accumulate.

    The recurrence divides exactly (a premultiplied 1/mu would bias every
    pmf by ~K*eps systematically), the suffix sum is Kahan-compensated, and
    thresholds are renormalized by ``t_total`` (see _nv_poisson_setup), so
    the inversion is accurate to the intra-recurrence drift ~1e-6."""
    vs = [(1.0 - u) * t_total for u in us]   # 1-u exact for 24-bit uniforms
    cnt = [jnp.zeros_like(u) for u in us]
    p = p_c
    T = jnp.zeros_like(p_c)                  # suffix sum S(k) before adding
    comp = jnp.zeros_like(p_c)
    kf = kc
    for _ in range(K):
        cnt = [c + (T < v).astype(jnp.float32) for c, v in zip(cnt, vs)]
        y = p - comp                         # Kahan-compensated T += p
        t_new = T + y
        comp = (t_new - T) - y
        T = t_new
        p = p * (kf / mu_safe)               # pmf(k-1) = pmf(k) * k / mu
        kf = kf - 1.0
    return [jnp.maximum(kc + 1.0 - c, 0.0) for c in cnt]


def _nv_fused_kernel(params: NewsvendorParams, num_steps, K, chunk,
                     seed_ref, econ_ref, rew_ref):
    """Whole episode with actions AND Poisson(mu) demand sampled on-core;
    native-tile (rows, sub, 128) layout. Demand uniforms are drawn and
    inverted ``chunk`` periods at a time (bounds live registers; the shared
    recurrence amortizes over the chunk)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    tile = rew_ref.shape[1:]
    price, cost, h, k = (econ_ref[i] for i in range(4))
    mu_safe, kc, p_c, t_total = _nv_poisson_setup(params, econ_ref[4])
    L = params.lead_time
    P = [jnp.zeros(tile, jnp.float32) for _ in range(L)]
    total = jnp.zeros(tile, jnp.float32)
    for t0 in range(0, num_steps, chunk):
        n = min(chunk, num_steps - t0)
        du = _uniform01((n,) + tile)
        ds = _nv_poisson_invert(mu_safe, kc, p_c, t_total, K,
                                [du[i] for i in range(n)])
        for i in range(n):
            order_raw = _uniform01(tile) * params.max_order_quantity
            P, reward, _q = _nv_step_math(params, P, price, cost, h, k,
                                          order_raw, ds[i])
            total = total + (params.gamma ** (t0 + i)) * reward
    rew_ref[0] = total


def _nv_streams_debug_kernel(params: NewsvendorParams, num_steps, K, chunk,
                             seed_ref, econ_ref, acts_ref, dems_ref):
    """Replays _nv_fused_kernel's exact PRNG consumption order (per chunk:
    demand uniforms then per-period action draw) and dumps both streams."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    tile = dems_ref.shape[1:]
    mu_safe, kc, p_c, t_total = _nv_poisson_setup(params, econ_ref[4])
    for t0 in range(0, num_steps, chunk):
        n = min(chunk, num_steps - t0)
        du = _uniform01((n,) + tile)
        ds = _nv_poisson_invert(mu_safe, kc, p_c, t_total, K,
                                [du[i] for i in range(n)])
        for i in range(n):
            acts_ref[t0 + i] = _uniform01(tile) * params.max_order_quantity
            dems_ref[t0 + i] = ds[i]


def _nv_fused_call(params, kernel_body, econ, seed, out_rows, block,
                   demand_chunk, interpret):
    B = econ.shape[1]
    assert B % block == 0 and block % 1024 == 0, (B, block)
    sub = block // 128
    _Wb, K, _lg = _nv_window(params)
    kernel = partial(kernel_body, params, params.step_limit, K, demand_chunk)

    def spec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec(5)],
        out_specs=[spec(r) for r in out_rows] if len(out_rows) > 1
        else spec(out_rows[0]),
        out_shape=[jax.ShapeDtypeStruct((r, B // 128, 128), jnp.float32)
                   for r in out_rows] if len(out_rows) > 1
        else jax.ShapeDtypeStruct((out_rows[0], B // 128, 128), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1),
      econ.reshape(5, B // 128, 128))
    return outs


def episode_returns_nv_fused(params: NewsvendorParams, econ, seed,
                             block: int = 2048, demand_chunk: int = 16,
                             interpret: bool = False):
    """Random-policy Newsvendor episode returns with NO pre-materialized
    streams — actions AND per-lane dynamic-mu Poisson demand sampled inside
    the kernel. ``econ`` (5, B) from the vectorized reset sampler
    (draw_econ). Returns (B,) float32."""
    out = _nv_fused_call(params, _nv_fused_kernel, econ, seed, (1,),
                         block, demand_chunk, interpret)
    return out.reshape(econ.shape[1])


# ------------------- reset-fused Newsvendor (econ drawn in-kernel as well)
#
# The newsvendor episode draws its economics (price, cost, h, k, mu) at
# reset (reference newsvendor.py:105-111). The econ-input kernel above has
# XLA sample them and stream (5, B) from HBM — fine at E=1, but interleaving
# E episodes per lane would put the reset tensor back on the HBM path
# (5*E*B f32: 640 MB at 4M lanes x E=8, as large as the demand stream the
# fused kernel exists to eliminate). This variant draws the five conditional
# uniforms on-core instead, making the whole episode — reset included —
# PRNG-seed-pure with zero per-lane input traffic, and interleaves
# ``episodes_per_lane`` independent episodes exactly like the
# InvManagement/NetInvMgmt fused kernels.

def _nv_econ_from_uniforms(params: NewsvendorParams, u5):
    """The reset's 5 sequential conditional uniforms (newsvendor.py:105-111)
    applied to in-kernel uniform draws; same formulas as draw_econ (same
    distribution as the XLA reset; hardware-PRNG stream)."""
    price = jnp.maximum(1.0, u5[0] * params.p_max)
    cost = jnp.maximum(1.0, u5[1] * price)
    h = u5[2] * jnp.minimum(cost, params.h_max)
    k = u5[3] * params.k_max
    mu = u5[4] * params.mu_max
    return price, cost, h, k, mu


def _nv_reset_fused_kernel(params: NewsvendorParams, num_steps, K, chunk,
                           n_episodes, seed_ref, rew_ref):
    """Whole episode with econ, actions AND demand all sampled on-core.

    PRNG consumption order (the streams-debug kernel below replays it
    verbatim): per episode a (5, tile) econ draw; then per demand chunk one
    (E*n, tile) uniform draw (episode-major rows e*n+i); then per period,
    per episode, one (tile,) action draw. ``n_episodes`` interleaves that
    many independent episodes per lane (independent econ, actions, demand)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    E = n_episodes
    tile = rew_ref.shape[1:]
    L = params.lead_time
    econ, setup = [], []
    for _ in range(E):
        econ.append(_nv_econ_from_uniforms(params, _uniform01((5,) + tile)))
        setup.append(_nv_poisson_setup(params, econ[-1][4]))
    P = [[jnp.zeros(tile, jnp.float32) for _ in range(L)] for _ in range(E)]
    total = [jnp.zeros(tile, jnp.float32) for _ in range(E)]
    for t0 in range(0, num_steps, chunk):
        n = min(chunk, num_steps - t0)
        du = _uniform01((E * n,) + tile)
        ds = [_nv_poisson_invert(*setup[e], K, [du[e * n + i]
                                               for i in range(n)])
              for e in range(E)]
        for i in range(n):
            for e in range(E):
                order_raw = _uniform01(tile) * params.max_order_quantity
                price, cost, h, k, _mu = econ[e]
                P[e], reward, _q = _nv_step_math(params, P[e], price, cost,
                                                 h, k, order_raw, ds[e][i])
                total[e] = total[e] + (params.gamma ** (t0 + i)) * reward
    for e in range(E):
        rew_ref[e] = total[e]


def _nv_reset_streams_debug_kernel(params: NewsvendorParams, num_steps, K,
                                   chunk, n_episodes, seed_ref, econ_ref,
                                   acts_ref, dems_ref):
    """Replays _nv_reset_fused_kernel's exact PRNG consumption order and
    dumps econ (5*E rows, episode-major), action and demand streams
    (num_steps*E rows, period-major then episode)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    E = n_episodes
    tile = dems_ref.shape[1:]
    setup = []
    for e in range(E):
        econ = _nv_econ_from_uniforms(params, _uniform01((5,) + tile))
        for i in range(5):
            econ_ref[e * 5 + i] = econ[i]
        setup.append(_nv_poisson_setup(params, econ[4]))
    for t0 in range(0, num_steps, chunk):
        n = min(chunk, num_steps - t0)
        du = _uniform01((E * n,) + tile)
        ds = [_nv_poisson_invert(*setup[e], K, [du[e * n + i]
                                               for i in range(n)])
              for e in range(E)]
        for i in range(n):
            for e in range(E):
                acts_ref[(t0 + i) * E + e] = (_uniform01(tile)
                                              * params.max_order_quantity)
                dems_ref[(t0 + i) * E + e] = ds[e][i]


def _nv_reset_fused_call(params, kernel_body, seed, out_rows, batch, block,
                         demand_chunk, n_episodes, interpret):
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    sub = block // 128
    _Wb, K, _lg = _nv_window(params)
    kernel = partial(kernel_body, params, params.step_limit, K, demand_chunk,
                     n_episodes)

    def spec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[spec(r) for r in out_rows] if len(out_rows) > 1
        else spec(out_rows[0]),
        out_shape=[jax.ShapeDtypeStruct((r, batch // 128, 128), jnp.float32)
                   for r in out_rows] if len(out_rows) > 1
        else jax.ShapeDtypeStruct((out_rows[0], batch // 128, 128),
                                  jnp.float32),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1))


def episode_returns_nv_reset_fused(params: NewsvendorParams, seed,
                                   batch: int, block: int = 2048,
                                   demand_chunk: int = 16,
                                   interpret: bool = False,
                                   episodes_per_lane: int = 1):
    """Random-policy Newsvendor episode returns with the RESET fused too:
    econ, actions, and per-lane dynamic-mu Poisson demand are all sampled
    inside the kernel — zero per-lane HBM input. ``episodes_per_lane`` > 1
    interleaves that many independent episodes per lane in one launch.
    Returns (batch,) for episodes_per_lane=1, else (episodes_per_lane,
    batch). This is the production dispatcher's Newsvendor path
    (vector.fast_episodes.random_episode_returns)."""
    E = episodes_per_lane
    out = _nv_reset_fused_call(params, _nv_reset_fused_kernel, seed, (E,),
                               batch, block, demand_chunk, E, interpret)
    return out.reshape(batch) if E == 1 else out.reshape(E, batch)


def sample_streams_debug_nv_reset(params: NewsvendorParams, seed, batch: int,
                                  block: int = 2048, demand_chunk: int = 16,
                                  interpret: bool = False,
                                  episodes_per_lane: int = 1):
    """The exact econ/action/demand streams episode_returns_nv_reset_fused
    consumes for ``seed`` (same block/demand_chunk/episodes_per_lane
    required — PRNG consumption is per-tile and per-draw-shape). Returns
    (econ (E, 5, batch), actions (T, E, batch), demands (T, E, batch))."""
    T, E = params.step_limit, episodes_per_lane
    econ, acts, dems = _nv_reset_fused_call(
        params, _nv_reset_streams_debug_kernel, seed, (5 * E, T * E, T * E),
        batch, block, demand_chunk, E, interpret)
    return (econ.reshape(E, 5, batch), acts.reshape(T, E, batch),
            dems.reshape(T, E, batch))


def sample_streams_debug_nv(params: NewsvendorParams, econ, seed,
                            block: int = 2048, demand_chunk: int = 16,
                            interpret: bool = False):
    """The exact action/demand streams episode_returns_nv_fused consumes for
    ``seed`` (same block/demand_chunk required — PRNG consumption is
    per-tile). Returns (actions (T, B) f32, demands (T, B) f32)."""
    T = params.step_limit
    acts, dems = _nv_fused_call(params, _nv_streams_debug_kernel, econ, seed,
                                (T, T), block, demand_chunk, interpret)
    B = econ.shape[1]
    return acts.reshape(T, B), dems.reshape(T, B)


# ------------------- policy-in-kernel Newsvendor (MXU actor, MLP eval)

def _nv_policy_kernel(params: NewsvendorParams, num_steps, K, chunk,
                      act_name, precision, n_layers, n_episodes,
                      dump_streams, stochastic, *refs):
    """Whole episode under a fused MLP policy (deterministic, or with
    in-kernel Gaussian exploration when ``stochastic``), reset fused
    too: econ drawn on-core (newsvendor.py:105-111), per-lane dynamic-mu
    Poisson demand inverted in chunks, obs = [econ, pipeline]
    (newsvendor.py obs layout, envs/newsvendor._obs) assembled from live
    state, actor as MXU matmuls, tanh-squash to [0, max_order]."""
    seed_ref = refs[0]
    Ws_refs = refs[1:1 + n_layers]
    bs_refs = refs[1 + n_layers:1 + 2 * n_layers]
    rest = refs[1 + 2 * n_layers:]
    std_ref = rest[0] if stochastic else None
    outs = rest[1:] if stochastic else rest
    if dump_streams:
        rew_ref, econ_ref, acts_ref, dems_ref = outs
    else:
        rew_ref, = outs
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    E = n_episodes
    tile = rew_ref.shape[1:]
    L = params.lead_time
    hi = float(params.max_order_quantity)
    econ, setup = [], []
    for e in range(E):
        econ.append(_nv_econ_from_uniforms(params, _uniform01((5,) + tile)))
        setup.append(_nv_poisson_setup(params, econ[-1][4]))
        if dump_streams:
            for i in range(5):
                econ_ref[e * 5 + i] = econ[e][i]
    P = [[jnp.zeros(tile, jnp.float32) for _ in range(L)] for _ in range(E)]
    total = [jnp.zeros(tile, jnp.float32) for _ in range(E)]
    for t0 in range(0, num_steps, chunk):
        n = min(chunk, num_steps - t0)
        du = _uniform01((E * n,) + tile)
        ds = [_nv_poisson_invert(*setup[e], K, [du[e * n + i]
                                               for i in range(n)])
              for e in range(E)]
        for i in range(n):
            for e in range(E):
                price, cost, h, k, mu = econ[e]
                obs_rows = [price, cost, h, k, mu] + P[e]
                H = mlp_forward(Ws_refs, bs_refs, act_name, precision,
                                obs_rows)
                if std_ref is not None:
                    H = H + std_ref[...] * _normal01(H.shape)
                order_raw = ((jnp.tanh(H[0:1]) + 1.0) * (0.5 * hi)
                             ).reshape(tile)
                P[e], reward, _q = _nv_step_math(params, P[e], price, cost,
                                                 h, k, order_raw, ds[e][i])
                total[e] = total[e] + (params.gamma ** (t0 + i)) * reward
                if dump_streams:
                    acts_ref[(t0 + i) * E + e] = order_raw
                    dems_ref[(t0 + i) * E + e] = ds[e][i]
    for e in range(E):
        rew_ref[e] = total[e]


def _nv_policy_call(params, actor, seed, batch, block, demand_chunk,
                    episodes_per_lane, dump_streams, interpret, precision,
                    log_std=None):
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    sub = block // 128
    E = episodes_per_lane
    T = params.step_limit
    _Wb, K, _lg = _nv_window(params)
    Ws, bs = actor
    kernel = partial(_nv_policy_kernel, params, T, K, demand_chunk, "tanh",
                     precision, len(Ws), E, dump_streams,
                     log_std is not None)

    def tspec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def wspec(a):
        shp = tuple(a.shape)
        return pl.BlockSpec(shp, lambda i, _n=len(shp): (0,) * _n,
                            memory_space=pltpu.VMEM)

    out_rows = [E] + ([5 * E, T * E, T * E] if dump_streams else [])
    out_specs = [tspec(r) for r in out_rows]
    out_shape = [jax.ShapeDtypeStruct((r, batch // 128, 128), jnp.float32)
                 for r in out_rows]
    if not dump_streams:
        out_specs, out_shape = out_specs[0], out_shape[0]
    Ws2 = [w.T for w in Ws]
    bs2 = [b.reshape(-1, 1) for b in bs]
    extra = []
    if log_std is not None:
        extra.append(clipped_std(log_std))
    return pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [wspec(w) for w in Ws2] + [wspec(b) for b in bs2]
        + [wspec(a) for a in extra],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), *Ws2, *bs2, *extra)


def episode_returns_nv_policy(params: NewsvendorParams, actor, seed,
                              batch: int, block: int = 1024,
                              demand_chunk: int = 16,
                              interpret: bool = False,
                              episodes_per_lane: int = 1, precision=None,
                              log_std=None):
    """Learned-policy Newsvendor episode returns — reset, demand, AND the
    MLP actor all fused in-kernel. ``actor`` from fold_actor_params.
    Deterministic by default; pass the trained ``log_std`` for stochastic
    evaluation (in-kernel Box-Muller exploration noise). Returns (batch,)
    or (episodes_per_lane, batch)."""
    E = episodes_per_lane
    out = _nv_policy_call(params, actor, seed, batch, block, demand_chunk,
                          E, False, interpret, precision, log_std)
    return out.reshape(batch) if E == 1 else out.reshape(E, batch)


def sample_policy_streams_debug_nv(params: NewsvendorParams, actor, seed,
                                   batch: int, block: int = 1024,
                                   demand_chunk: int = 16,
                                   interpret: bool = False,
                                   episodes_per_lane: int = 1,
                                   precision=None, log_std=None):
    """(returns, econ (E, 5, batch), actions (T, E, batch), demands
    (T, E, batch)) — the exact streams the NV policy kernel
    produced/consumed (PRNG consumption: econ, then demand chunks,
    plus the per-period noise draws when ``log_std`` is given)."""
    T, E = params.step_limit, episodes_per_lane
    rew, econ, acts, dems = _nv_policy_call(
        params, actor, seed, batch, block, demand_chunk, E, True,
        interpret, precision, log_std)
    rew = rew.reshape(batch) if E == 1 else rew.reshape(E, batch)
    return (rew, econ.reshape(E, 5, batch), acts.reshape(T, E, batch),
            dems.reshape(T, E, batch))


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


def _im_sample_actions(params, tile, n_episodes=1):
    """One PRNG draw covering ``n_episodes`` interleaved episodes' actions
    (episode e, stage i at index e*m1+i). n_episodes=1 draws the exact same
    stream as the pre-interleave kernel."""
    m1 = params.m1
    u = _uniform01((n_episodes * m1,) + tile)
    return [jnp.minimum((u[i] * float(params.c[i % m1] + 1)
                         ).astype(jnp.int32),
                        jnp.int32(params.c[i % m1]))
            for i in range(n_episodes * m1)]


def _im_sample_demand(params, tile, t, spec, n_episodes=1):
    """List of ``n_episodes`` demand rows for period ``t``. The n_episodes=1
    draw shape is kept identical to the pre-interleave kernel (PRNG
    bit->lane assignment depends on the requested shape)."""
    if spec is None:  # USER: deterministic per period, no PRNG draw
        v = int(params.user_D[t]) if t < len(params.user_D) else 0
        return [jnp.full(tile, v, jnp.int32)] * n_episodes
    base, table = spec
    if n_episodes == 1:
        us = [_uniform01(tile)]
    else:
        us = list(_uniform01((n_episodes,) + tile))
    return [_invert_discrete_i32(u, base, table) for u in us]


def _im_fused_kernel(params: InvManagementParams, num_steps, spec,
                     n_episodes, seed_ref, rew_ref):
    """Whole episode with actions AND demand sampled on-core; (rows, sub,
    128) native-tile layout (see ops/pallas_net_step.py — same design,
    measured there at 14.7x the pre-sampled round-1 path combined with the
    in-kernel demand).

    ``n_episodes`` simulates that many INDEPENDENT episodes per lane,
    interleaved per period — E independent dependency chains pipeline
    around the serial per-period event chain exactly as in the NetInvMgmt
    kernel (PERFORMANCE.md "the ILP ceiling measured, then broken")."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    E = n_episodes
    m1, lt = params.m1, params.lt_max
    tile = rew_ref.shape[1:]
    zero = jnp.zeros(tile, jnp.int32)
    inv = [[jnp.full(tile, int(i0), jnp.int32) for i0 in params.I0]
           for _ in range(E)]
    bkl = [[zero for _ in range(params.num_stages)] for _ in range(E)]
    RH = [[zero for _ in range(lt * m1)] for _ in range(E)]
    total = [jnp.zeros(tile, jnp.float32) for _ in range(E)]
    for t in range(num_steps):
        acts = _im_sample_actions(params, tile, E)
        dems = _im_sample_demand(params, tile, t, spec, E)
        for e in range(E):
            inv[e], bkl[e], RH[e], _, profit = _im_step_math(
                params, t, inv[e], bkl[e], RH[e],
                acts[e * m1:(e + 1) * m1], dems[e])
            total[e] = total[e] + (params.alpha ** t) * profit
    for e in range(E):
        rew_ref[e] = total[e]


def _im_streams_debug_kernel(params: InvManagementParams, num_steps, spec,
                             n_episodes, seed_ref, acts_ref, dems_ref):
    """Replays _im_fused_kernel's exact PRNG consumption order (per period:
    all E*m1 action draws then all E demand draws) and dumps both streams
    for pinning."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    E = n_episodes
    m1 = params.m1
    tile = dems_ref.shape[1:]
    for t in range(num_steps):
        acts = _im_sample_actions(params, tile, E)
        for i in range(E * m1):
            acts_ref[t * E * m1 + i] = acts[i]
        dems = _im_sample_demand(params, tile, t, spec, E)
        for e in range(E):
            dems_ref[t * E + e] = dems[e]


def episode_returns_im_fused(params: InvManagementParams, seed,
                             batch: int, block: int = 2048,
                             interpret: bool = False,
                             episodes_per_lane: int = 1):
    """Random-policy episode returns with NO pre-materialized streams —
    uniform-int actions AND demand (all four stochastic reference dist
    modes, via exact compile-time CDF inversion; USER mode baked as
    per-period constants) sampled inside the kernel.

    ``episodes_per_lane`` > 1 simulates that many independent episodes per
    lane in one launch (same ILP-pipelining win as the NetInvMgmt kernel —
    tools/ilp_probe.py). Returns (batch,) for episodes_per_lane=1, else
    (episodes_per_lane, batch)."""
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    sub = block // 128
    E = episodes_per_lane
    spec = _im_demand_spec(params)
    kernel = partial(_im_fused_kernel, params, params.periods, spec, E)
    out = pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((E, sub, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, batch // 128, 128), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1))
    return out.reshape(batch) if E == 1 else out.reshape(E, batch)


# ------------------- policy-in-kernel InvManagement (MXU actor, MLP eval)
#
# The random-policy kernels above evaluate at 14B+ steps/s, but a LEARNED
# policy previously had to run through the XLA vmap rollout (~50-80M
# steps/s): per period the obs batch leaves the env program, an MLP forward
# runs as separate XLA ops, and the action comes back — every boundary a
# round-trip through HBM. This kernel fuses the deterministic MLP actor
# (the benchmark pi_arch, e.g. 64x64 tanh — agents/networks.MLPActorCritic
# + make_eval_policy(deterministic=True)) INTO the episode kernel: per
# period the obs tile is assembled in VMEM from the live env state
# (reference obs layout, inventory_management.py:354-391), the trunk runs
# as (out, in) @ (in, block) MXU matmuls with the weights VMEM-resident,
# the tanh-squash + int cast produce the action rows, and the env period
# consumes them without the state ever leaving VMEM. Obs normalization
# (rms) is folded into the first layer on host (fold_actor_params), so the
# kernel sees plain dense layers.

def clipped_std(log_std):
    """``exp(clip(log_std))`` with networks.gaussian_sample's clip range,
    shaped (act_dim, 1) for the kernels' lane-broadcast std input — the
    ONE place the clip constants live on the kernel side (every stochastic
    policy/trajectory kernel call folds its std through here)."""
    return jnp.exp(jnp.clip(jnp.asarray(log_std, jnp.float32),
                            -10.0, 2.0)).reshape(-1, 1)


def fold_actor_params(cfg, model_params, rms=None):
    """Extract the deterministic actor from a PPO/A2C train state as plain
    (Ws, bs) f32 arrays, with the obs RunningMeanStd normalization folded
    into the first layer: norm = (x - mu) / sqrt(var + eps), so
    W1' = W1 * invstd[:, None] and b1' = b1 - (mu * invstd) @ W1.
    Layers are the pi trunk (activation after each) plus the mean head
    (no activation), matching make_eval_policy's deterministic path."""
    assert getattr(cfg, "activation", "tanh") == "tanh", (
        "policy-in-kernel supports tanh trunks (the benchmark default); "
        f"got activation={cfg.activation!r}")
    p = model_params["params"]
    n_pi = len(cfg.pi_arch)
    Ws, bs = [], []
    for i in range(n_pi + 1):  # Dense_0..Dense_{n_pi-1} trunk, Dense_{n_pi} mean
        d = p[f"Dense_{i}"]
        Ws.append(jnp.asarray(d["kernel"], jnp.float32))
        bs.append(jnp.asarray(d["bias"], jnp.float32))
    if rms is not None and getattr(cfg, "normalize_obs", True):
        invstd = 1.0 / jnp.sqrt(jnp.asarray(rms.var, jnp.float32) + 1e-8)
        mu = jnp.asarray(rms.mean, jnp.float32)
        bs[0] = bs[0] - (mu * invstd) @ Ws[0]
        Ws[0] = Ws[0] * invstd[:, None]
    return tuple(Ws), tuple(bs)


def fold_offpolicy_actor(pi_arch, actor_params, rms=None,
                         stochastic: bool = False):
    """Extract the off-policy actor (agents/off_policy._Actor: relu trunk,
    mean head, and for SAC a state-dependent log_std head) as plain
    (Ws, bs) f32 arrays for the trajectory kernels, with the obs
    RunningMeanStd normalization folded into the first layer exactly as
    ``fold_actor_params`` does. For ``stochastic`` (SAC) the mean and
    log_std heads are CONCATENATED into one output matmul — the kernel's
    ``traj_policy('sac', ...)`` splits the 2*act_dim rows back apart —
    so the trunk runs once, as in ``_Actor.__call__``."""
    p = actor_params["params"]
    n_pi = len(pi_arch)
    Ws, bs = [], []
    for i in range(n_pi):
        d = p[f"Dense_{i}"]
        Ws.append(jnp.asarray(d["kernel"], jnp.float32))
        bs.append(jnp.asarray(d["bias"], jnp.float32))
    mean_h = p[f"Dense_{n_pi}"]
    W_out = jnp.asarray(mean_h["kernel"], jnp.float32)
    b_out = jnp.asarray(mean_h["bias"], jnp.float32)
    if stochastic:
        ls_h = p[f"Dense_{n_pi + 1}"]
        W_out = jnp.concatenate(
            [W_out, jnp.asarray(ls_h["kernel"], jnp.float32)], axis=1)
        b_out = jnp.concatenate(
            [b_out, jnp.asarray(ls_h["bias"], jnp.float32)], axis=0)
    Ws.append(W_out)
    bs.append(b_out)
    if rms is not None:
        invstd = 1.0 / jnp.sqrt(jnp.asarray(rms.var, jnp.float32) + 1e-8)
        mu = jnp.asarray(rms.mean, jnp.float32)
        bs[0] = bs[0] - (mu * invstd) @ Ws[0]
        Ws[0] = Ws[0] * invstd[:, None]
    return tuple(Ws), tuple(bs)


def traj_policy(mode, act_name, act_dim, Ws_refs, bs_refs, std_ref,
                precision, obs_rows):
    """In-kernel policy head shared by the trajectory-emitting rollouts
    (`_im_traj_kernel` / `_nv_traj_kernel` / pallas_net_step's
    `_net_traj_kernel`). Returns ``(store, a_norm)``, each (act_dim, n)
    over the flattened tile: ``store`` is the per-action stream the
    kernel dumps to HBM, ``a_norm`` the normalized [-1, 1] action the env
    consumes via ``low + (a_norm + 1) * 0.5 * (high - low)``.

    Modes (PRNG consumption is mode-consistent; streams-debug replays fix
    one mode at a time):
      - ``'ppo'``: pre-squash Gaussian on the tanh-trunk mean
        (networks.gaussian_sample semantics) — store the RAW sample for
        logp recomputation; ``a_norm = tanh(raw)``. Bit-identical to the
        original inline code of the three kernels.
      - ``'det'``: TD3/DDPG collection — deterministic mean, tanh-squash,
        then CLIPPED exploration noise in normalized action space
        (``std_ref`` carries the sigma; SB3 post-squash convention,
        agents/off_policy.update's collect phase); store ``a_norm``.
      - ``'sac'``: squashed state-dependent Gaussian — the output matmul
        carries 2*act_dim rows (mean ‖ log_std, `fold_offpolicy_actor`),
        ``raw = mean + exp(clip(ls)) * eps``, ``a_norm = tanh(raw)``;
        store ``a_norm`` (SAC recomputes logp from the buffer itself).
      - ``'uniform'``: warmup — uniform a_norm in [-1, 1] (SB3's
        action_space.sample() phase); the actor weights are unused.
    """
    if mode == "uniform":
        n = 1
        for s in obs_rows[0].shape:
            n *= s
        a = 2.0 * _uniform01((act_dim, n)) - 1.0
        return a, a
    H = mlp_forward(Ws_refs, bs_refs, act_name, precision, obs_rows)
    if mode == "ppo":
        H = H + std_ref[...] * _normal01(H.shape)
        return H, jnp.tanh(H)
    if mode == "det":
        a = jnp.clip(jnp.tanh(H) + std_ref[...] * _normal01(H.shape),
                     -1.0, 1.0)
        return a, a
    if mode == "sac":
        mean, ls = H[:act_dim], H[act_dim:]
        std = jnp.exp(jnp.clip(ls, -10.0, 2.0))
        a = jnp.tanh(mean + std * _normal01(mean.shape))
        return a, a
    raise ValueError(f"unknown traj_policy mode {mode!r}")


def folded_actor_mean(actor, obs):
    """Pre-squash policy mean of a folded actor as plain XLA ops — the
    shared trunk of every fallback path (deterministic squash in
    apply_folded_actor, Gaussian sampling in the stochastic fallback).
    ``obs`` (B, obs_dim); returns (B, act_dim) float32."""
    Ws, bs = actor
    H = obs.astype(jnp.float32)
    for i, (W, b) in enumerate(zip(Ws, bs)):
        H = H @ W + b
        if i < len(Ws) - 1:
            H = jnp.tanh(H)
    return H


def apply_folded_actor(actor, obs, low, high, int_actions: bool):
    """The folded actor as plain XLA ops — the exact math the policy
    kernels run, for fallback paths and cross-checks: tanh trunk, mean
    head, networks.squash_action, optional int cast. ``obs`` (B, obs_dim);
    returns (B, act_dim)."""
    from or_gym_inventory_tpu.agents import networks
    a = networks.squash_action(folded_actor_mean(actor, obs), low, high)
    return a.astype(jnp.int32) if int_actions else a


def _im_obs_rows(params: InvManagementParams, t, inv, AH):
    """The reference observation as a list of (tile) rows: on-hand I[t],
    then the last min(t, lt_max) REQUESTED actions chronologically,
    front-packed with zero rows at the end when t < lt_max (the static-
    period unrolled form of envs/inv_management._obs's roll)."""
    m1, lt = params.m1, params.lt_max
    rows = list(inv)
    shift = max(0, lt - t)
    for j in range(lt):
        src = (j + shift) % lt if lt else 0
        # chron[j] = AH[slot lt-1-j]; wrapped rows land on the zero slots
        for i in range(m1):
            rows.append(AH[(lt - 1 - src) * m1 + i])
    return rows


def mlp_forward(Ws_refs, bs_refs, act_name, precision, obs_rows):
    """Shared in-kernel MLP trunk + head: stacked obs rows (each a VMEM
    tile) -> (act_dim, lanes) raw means via (out, in) @ (in, lanes) MXU
    matmuls, weights read whole from their VMEM refs. ``precision`` is the
    MXU matmul precision: None (default, bf16-class passes — right for
    throughput; the policy is statistically identical) or
    jax.lax.Precision.HIGHEST (full f32 — used by the parity tests so
    int-cast boundary ties against the XLA path become ~1e-6 rare)."""
    n = 1
    for s in obs_rows[0].shape:
        n *= s
    act = dict(tanh=jnp.tanh, relu=lambda x: jnp.maximum(x, 0.0))[act_name]
    H = jnp.stack([r.astype(jnp.float32) for r in obs_rows]).reshape(
        len(obs_rows), n)
    n_layers = len(Ws_refs)
    for i in range(n_layers):
        W = Ws_refs[i][...]          # (out, in): pre-transposed on host
        b = bs_refs[i][...]          # (out, 1): broadcasts over lanes
        H = jnp.dot(W, H, preferred_element_type=jnp.float32,
                    precision=precision) + b
        if i < n_layers - 1:
            H = act(H)
    return H


def _policy_actions(params, Ws_refs, bs_refs, act_name, precision,
                    obs_rows, std_ref=None):
    """Actor on the MXU: mlp_forward then tanh-squash to [0, c] -> int32
    (make_eval_policy's exact deterministic math, networks.squash_action +
    the int cast). With ``std_ref`` ((act_dim, 1), exp of the clipped
    log_std) the pre-squash mean gets Gaussian exploration noise from the
    in-kernel Box-Muller sampler — networks.gaussian_sample's math on the
    hardware PRNG stream (one (act_dim, lanes)-shaped `_normal01` draw per
    call, i.e. two uniforms)."""
    tile = obs_rows[0].shape
    H = mlp_forward(Ws_refs, bs_refs, act_name, precision, obs_rows)
    if std_ref is not None:
        H = H + std_ref[...] * _normal01(H.shape)
    # squash to [0, c]: low = 0, high = c_i (static scalar per action row —
    # Python floats inline as immediates; a traced array would be a
    # captured constant, which pallas_call rejects)
    S = jnp.tanh(H) + 1.0
    return [((S[i:i + 1]) * (0.5 * float(params.c[i])))
            .astype(jnp.int32).reshape(tile) for i in range(params.m1)]


def _im_policy_kernel(params: InvManagementParams, num_steps, spec, act_name,
                      precision, n_layers, n_episodes, dump_streams,
                      stochastic, *refs):
    """Whole episode under the fused MLP policy (deterministic, or with
    in-kernel Gaussian exploration when ``stochastic``); optionally dumps
    the action/demand streams it produces (for pinning through the
    pre-materialized kernel / the XLA chain)."""
    seed_ref = refs[0]
    Ws_refs = refs[1:1 + n_layers]
    bs_refs = refs[1 + n_layers:1 + 2 * n_layers]
    rest = refs[1 + 2 * n_layers:]
    std_ref = rest[0] if stochastic else None
    outs = rest[1:] if stochastic else rest
    if dump_streams:
        rew_ref, acts_ref, dems_ref = outs
    else:
        rew_ref, = outs
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    E = n_episodes
    m1, lt = params.m1, params.lt_max
    tile = rew_ref.shape[1:]
    zero = jnp.zeros(tile, jnp.int32)
    inv = [[jnp.full(tile, int(i0), jnp.int32) for i0 in params.I0]
           for _ in range(E)]
    bkl = [[zero for _ in range(params.num_stages)] for _ in range(E)]
    RH = [[zero for _ in range(lt * m1)] for _ in range(E)]
    AH = [[zero for _ in range(lt * m1)] for _ in range(E)]
    total = [jnp.zeros(tile, jnp.float32) for _ in range(E)]
    for t in range(num_steps):
        dems = _im_sample_demand(params, tile, t, spec, E)
        for e in range(E):
            acts = _policy_actions(params, Ws_refs, bs_refs, act_name,
                                   precision,
                                   _im_obs_rows(params, t, inv[e], AH[e]),
                                   std_ref)
            inv[e], bkl[e], RH[e], r_req, profit = _im_step_math(
                params, t, inv[e], bkl[e], RH[e], acts, dems[e])
            if lt:
                AH[e] = r_req + AH[e][: (lt - 1) * m1]
            total[e] = total[e] + (params.alpha ** t) * profit
            if dump_streams:
                for i in range(m1):
                    acts_ref[(t * E + e) * m1 + i] = acts[i]
                dems_ref[t * E + e] = dems[e]
    for e in range(E):
        rew_ref[e] = total[e]


def _im_policy_call(params, actor, seed, batch, block, episodes_per_lane,
                    dump_streams, interpret, precision=None, log_std=None):
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    sub = block // 128
    E = episodes_per_lane
    T = params.periods
    Ws, bs = actor
    spec = _im_demand_spec(params)
    kernel = partial(_im_policy_kernel, params, T, spec, "tanh", precision,
                     len(Ws), E, dump_streams, log_std is not None)

    def tspec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def wspec(a):
        shp = tuple(a.shape)
        return pl.BlockSpec(shp, lambda i, _n=len(shp): (0,) * _n,
                            memory_space=pltpu.VMEM)

    m1 = params.m1
    out_rows = [E] + ([T * E * m1, T * E] if dump_streams else [])
    out_specs = [tspec(r) for r in out_rows]
    out_shape = [jax.ShapeDtypeStruct((r, batch // 128, 128),
                                      jnp.float32 if i == 0 else jnp.int32)
                 for i, r in enumerate(out_rows)]
    if not dump_streams:
        out_specs, out_shape = out_specs[0], out_shape[0]
    Ws = [w.T for w in Ws]                # kernel wants (out, in)
    bs2 = [b.reshape(-1, 1) for b in bs]  # (out, 1): lane-broadcastable
    extra = []
    if log_std is not None:
        extra.append(clipped_std(log_std))
    outs = pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [wspec(w) for w in Ws] + [wspec(b) for b in bs2]
        + [wspec(a) for a in extra],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), *Ws, *bs2, *extra)
    return outs


def episode_returns_im_policy(params: InvManagementParams, actor, seed,
                              batch: int, block: int = 1024,
                              interpret: bool = False,
                              episodes_per_lane: int = 1, precision=None,
                              log_std=None):
    """Learned-policy episode returns, policy fused in-kernel.

    ``actor`` is ``(Ws, bs)`` from ``fold_actor_params`` (pi trunk + mean
    head, obs normalization pre-folded). Demand is sampled on-core from the
    compile-time CDF tables (all four stochastic dist modes; USER baked).
    Deterministic by default; pass the trained ``log_std`` ((act_dim,) —
    e.g. ``model_params["params"]["log_std"]``) for stochastic evaluation
    with in-kernel Box-Muller exploration noise (networks.gaussian_sample
    semantics on the hardware PRNG stream).
    Returns (batch,) for episodes_per_lane=1, else (episodes_per_lane,
    batch). Pinned by ``sample_policy_streams_debug_im`` feeding
    ``episode_returns_im`` (tests/test_pallas_policy.py)."""
    E = episodes_per_lane
    out = _im_policy_call(params, actor, seed, batch, block, E, False,
                          interpret, precision, log_std)
    return out.reshape(batch) if E == 1 else out.reshape(E, batch)


def sample_policy_streams_debug_im(params: InvManagementParams, actor, seed,
                                   batch: int, block: int = 1024,
                                   interpret: bool = False,
                                   episodes_per_lane: int = 1,
                                   precision=None, log_std=None):
    """Returns (returns, actions, demands) where actions (T, E, m1, batch)
    i32 and demands (T, E, batch) i32 are the exact streams the policy
    kernel produced/consumed — identical PRNG consumption (demand, plus
    the per-period noise draws when ``log_std`` is given), so the returns
    equal episode_returns_im_policy's for the same seed."""
    T, m1, E = params.periods, params.m1, episodes_per_lane
    rew, acts, dems = _im_policy_call(params, actor, seed, batch, block, E,
                                      True, interpret, precision, log_std)
    rew = rew.reshape(batch) if E == 1 else rew.reshape(E, batch)
    return (rew, acts.reshape(T, E, m1, batch), dems.reshape(T, E, batch))


# ----------------------- LSTM-policy-in-kernel (recurrent MXU evaluator)
#
# PPO_LSTM tops two RESULTS.md tables, yet recurrent policies previously
# had no kernel path — evaluation ran through the XLA rollout (the carry-
# threading evaluate_episodes_seeded_stateful, ~10-60M steps/s). The LSTM
# cell is just two MXU matmuls plus elementwise gates, and the hidden
# state is nothing special in this kernel design: (hidden, lanes) f32
# planes living in VMEM next to the env state. Per period:
#
#   X (obs_dim, n)  obs rows assembled from live env state (_im_obs_rows)
#   E = act(Wenc @ X + benc)                    encoder    (enc, n)
#   G = Wx @ E + Wh @ H + bh                    gates      (4*hidden, n)
#   i,f,g,o = sigmoid/tanh splits of G's row blocks (flax OptimizedLSTMCell
#             layout: [ii|if|ig|io] / [hi|hf|hg|ho], agents/networks.py)
#   C = f*C + i*g ; H = o*tanh(C)
#   mean = Wm @ H + bm -> tanh-squash -> int actions
#
# The Wh @ H matmul is (4h, h) @ (h, block) — MXU-shaped with zero padding
# waste at hidden=128. Pinned like the MLP policy kernels: the dump twin
# replays the PRNG order and the dumped streams reproduce through the
# pre-materialized kernel and the XLA flax chain.

def fold_lstm_actor(cfg, model_params, rms=None):
    """Extract the deterministic LSTM actor from a RecurrentPPO/A2C_LSTM
    train state as plain (out, in)-layout f32 arrays, obs normalization
    folded into the encoder's first layer. Returns a dict with keys
    enc (list of (W, b)), wx (4h, enc), wh (4h, h), bh (4h, 1),
    wm (act, h), bm (act, 1) — gate row blocks ordered [i, f, g, o]."""
    assert getattr(cfg, "activation", "tanh") == "tanh", (
        "LSTM-policy-in-kernel supports tanh encoders (the benchmark "
        f"default); got activation={cfg.activation!r}")
    p = model_params["params"]
    n_enc = len(cfg.encoder)
    enc = []
    for i in range(n_enc):
        d = p[f"Dense_{i}"]
        W = jnp.asarray(d["kernel"], jnp.float32)
        b = jnp.asarray(d["bias"], jnp.float32)
        if i == 0 and rms is not None and getattr(cfg, "normalize_obs", True):
            invstd = 1.0 / jnp.sqrt(jnp.asarray(rms.var, jnp.float32) + 1e-8)
            mu = jnp.asarray(rms.mean, jnp.float32)
            b = b - (mu * invstd) @ W
            W = W * invstd[:, None]
        enc.append((W.T, b.reshape(-1, 1)))
    cell = p["OptimizedLSTMCell_0"]
    wx = jnp.concatenate([jnp.asarray(cell[k]["kernel"], jnp.float32)
                          for k in ("ii", "if", "ig", "io")], axis=1).T
    wh = jnp.concatenate([jnp.asarray(cell[k]["kernel"], jnp.float32)
                          for k in ("hi", "hf", "hg", "ho")], axis=1).T
    bh = jnp.concatenate([jnp.asarray(cell[k]["bias"], jnp.float32)
                          for k in ("hi", "hf", "hg", "ho")]).reshape(-1, 1)
    mean_head = p[f"Dense_{n_enc}"]  # Dense_{n_enc+1} is the value head
    wm = jnp.asarray(mean_head["kernel"], jnp.float32).T
    bm = jnp.asarray(mean_head["bias"], jnp.float32).reshape(-1, 1)
    return dict(enc=enc, wx=wx, wh=wh, bh=bh, wm=wm, bm=bm)


def _im_lstm_kernel(params: InvManagementParams, num_steps, spec, precision,
                    n_enc, hidden, dump_streams, *refs):
    seed_ref = refs[0]
    enc_refs = refs[1:1 + 2 * n_enc]
    wx_ref, wh_ref, bh_ref, wm_ref, bm_ref = refs[1 + 2 * n_enc:
                                                  6 + 2 * n_enc]
    outs = refs[6 + 2 * n_enc:]
    if dump_streams:
        rew_ref, acts_ref, dems_ref = outs
    else:
        rew_ref, = outs
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    m1, lt = params.m1, params.lt_max
    tile = rew_ref.shape[1:]
    n = 1
    for s in tile:
        n *= s
    zero = jnp.zeros(tile, jnp.int32)
    inv = [jnp.full(tile, int(i0), jnp.int32) for i0 in params.I0]
    bkl = [zero for _ in range(params.num_stages)]
    RH = [zero for _ in range(lt * m1)]
    AH = [zero for _ in range(lt * m1)]
    H = jnp.zeros((hidden, n), jnp.float32)
    C = jnp.zeros((hidden, n), jnp.float32)
    total = jnp.zeros(tile, jnp.float32)
    dot = partial(jnp.dot, preferred_element_type=jnp.float32,
                  precision=precision)
    for t in range(num_steps):
        dems = _im_sample_demand(params, tile, t, spec, 1)
        obs_rows = _im_obs_rows(params, t, inv, AH)
        X = jnp.stack([r.astype(jnp.float32) for r in obs_rows]).reshape(
            len(obs_rows), n)
        for i in range(n_enc):
            X = jnp.tanh(dot(enc_refs[2 * i][...], X)
                         + enc_refs[2 * i + 1][...])
        G = dot(wx_ref[...], X) + dot(wh_ref[...], H) + bh_ref[...]
        ig = jax.nn.sigmoid(G[0:hidden])
        fg = jax.nn.sigmoid(G[hidden:2 * hidden])
        gg = jnp.tanh(G[2 * hidden:3 * hidden])
        og = jax.nn.sigmoid(G[3 * hidden:4 * hidden])
        C = fg * C + ig * gg
        H = og * jnp.tanh(C)
        M = dot(wm_ref[...], H) + bm_ref[...]
        S = jnp.tanh(M) + 1.0
        acts = [((S[i:i + 1]) * (0.5 * float(params.c[i])))
                .astype(jnp.int32).reshape(tile) for i in range(m1)]
        inv, bkl, RH, r_req, profit = _im_step_math(
            params, t, inv, bkl, RH, acts, dems[0])
        if lt:
            AH = r_req + AH[: (lt - 1) * m1]
        total = total + (params.alpha ** t) * profit
        if dump_streams:
            for i in range(m1):
                acts_ref[t * m1 + i] = acts[i]
            dems_ref[t] = dems[0]
    rew_ref[0] = total


def _im_lstm_call(params, actor, seed, batch, block, dump_streams,
                  interpret, precision):
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    sub = block // 128
    T, m1 = params.periods, params.m1
    spec = _im_demand_spec(params)
    hidden = actor["wh"].shape[1]
    n_enc = len(actor["enc"])
    kernel = partial(_im_lstm_kernel, params, T, spec, precision, n_enc,
                     hidden, dump_streams)

    def tspec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def wspec(a):
        shp = tuple(a.shape)
        return pl.BlockSpec(shp, lambda i, _n=len(shp): (0,) * _n,
                            memory_space=pltpu.VMEM)

    weights = [w for pair in actor["enc"] for w in pair] + [
        actor["wx"], actor["wh"], actor["bh"], actor["wm"], actor["bm"]]
    out_rows = [1] + ([T * m1, T] if dump_streams else [])
    out_specs = [tspec(r) for r in out_rows]
    out_shape = [jax.ShapeDtypeStruct((r, batch // 128, 128),
                                      jnp.float32 if i == 0 else jnp.int32)
                 for i, r in enumerate(out_rows)]
    if not dump_streams:
        out_specs, out_shape = out_specs[0], out_shape[0]
    return pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [wspec(w) for w in weights],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), *weights)


def episode_returns_im_lstm(params: InvManagementParams, actor, seed,
                            batch: int, block: int = 1024,
                            interpret: bool = False, precision=None):
    """Deterministic LSTM-policy episode returns, the recurrent cell fused
    in-kernel (see the section comment). ``actor`` from
    ``fold_lstm_actor``. Returns (batch,) float32."""
    out = _im_lstm_call(params, actor, seed, batch, block, False, interpret,
                        precision)
    return out.reshape(batch)


def sample_lstm_streams_debug_im(params: InvManagementParams, actor, seed,
                                 batch: int, block: int = 1024,
                                 interpret: bool = False, precision=None):
    """(returns, actions (T, m1, batch) i32, demands (T, batch) i32) — the
    exact streams the LSTM policy kernel produced/consumed (identical PRNG
    consumption: demand only)."""
    T, m1 = params.periods, params.m1
    rew, acts, dems = _im_lstm_call(params, actor, seed, batch, block, True,
                                    interpret, precision)
    return (rew.reshape(batch), acts.reshape(T, m1, batch),
            dems.reshape(T, batch))


def _im_lstm_traj_kernel(params: InvManagementParams, num_steps, spec,
                         precision, n_enc, hidden, *refs):
    """LSTM trajectory-emitting rollout (the recurrent analogue of
    `_im_traj_kernel`): stochastic LSTM actor — encoder + recurrent cell
    + mean head as MXU matmuls with the (hidden, lanes) carry
    VMEM-resident, exploration noise from the in-kernel Box-Muller
    sampler — dumping the training streams (start-of-period inv,
    env-consumed int actions, pre-squash raws, alpha^t rewards,
    demand). Feeds RecurrentPPOConfig(rollout="kernel")."""
    seed_ref = refs[0]
    enc_refs = refs[1:1 + 2 * n_enc]
    wx_ref, wh_ref, bh_ref, wm_ref, bm_ref = refs[1 + 2 * n_enc:
                                                  6 + 2 * n_enc]
    std_ref = refs[6 + 2 * n_enc]
    inv_ref, acts_ref, raw_ref, rew_ref, dems_ref = refs[7 + 2 * n_enc:]
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    m1, lt = params.m1, params.lt_max
    tile = rew_ref.shape[1:]
    n = 1
    for s in tile:
        n *= s
    zero = jnp.zeros(tile, jnp.int32)
    inv = [jnp.full(tile, int(i0), jnp.int32) for i0 in params.I0]
    bkl = [zero for _ in range(params.num_stages)]
    RH = [zero for _ in range(lt * m1)]
    AH = [zero for _ in range(lt * m1)]
    H = jnp.zeros((hidden, n), jnp.float32)
    C = jnp.zeros((hidden, n), jnp.float32)
    dot = partial(jnp.dot, preferred_element_type=jnp.float32,
                  precision=precision)
    for t in range(num_steps):
        # PRNG order per period: demand draw, then one (m1, n) noise draw
        dems = _im_sample_demand(params, tile, t, spec, 1)
        dems_ref[t] = dems[0]
        for i in range(m1):
            inv_ref[t * m1 + i] = inv[i]
        obs_rows = _im_obs_rows(params, t, inv, AH)
        X = jnp.stack([r.astype(jnp.float32) for r in obs_rows]).reshape(
            len(obs_rows), n)
        for i in range(n_enc):
            X = jnp.tanh(dot(enc_refs[2 * i][...], X)
                         + enc_refs[2 * i + 1][...])
        G = dot(wx_ref[...], X) + dot(wh_ref[...], H) + bh_ref[...]
        ig = jax.nn.sigmoid(G[0:hidden])
        fg = jax.nn.sigmoid(G[hidden:2 * hidden])
        gg = jnp.tanh(G[2 * hidden:3 * hidden])
        og = jax.nn.sigmoid(G[3 * hidden:4 * hidden])
        C = fg * C + ig * gg
        H = og * jnp.tanh(C)
        M = dot(wm_ref[...], H) + bm_ref[...]
        M = M + std_ref[...] * _normal01(M.shape)
        S = jnp.tanh(M) + 1.0
        acts = []
        for i in range(m1):
            raw_ref[t * m1 + i] = M[i:i + 1].reshape(tile)
            a = (S[i:i + 1] * (0.5 * float(params.c[i]))
                 ).astype(jnp.int32).reshape(tile)
            acts_ref[t * m1 + i] = a
            acts.append(a)
        inv, bkl, RH, r_req, profit = _im_step_math(
            params, t, inv, bkl, RH, acts, dems[0])
        if lt:
            AH = r_req + AH[: (lt - 1) * m1]
        rew_ref[t] = (params.alpha ** t) * profit
    for i in range(m1):  # final snapshot: the bootstrap obs's on-hand
        inv_ref[num_steps * m1 + i] = inv[i]


def rollout_traj_im_lstm(params: InvManagementParams, actor, log_std, seed,
                         batch: int, block: int = 1024,
                         interpret: bool = False, precision=None):
    """One full stochastic-LSTM-policy episode per lane with the training
    streams written to HBM. ``actor`` from ``fold_lstm_actor`` (obs
    normalization pre-folded). Matmuls default to DEFAULT (bf16-class)
    precision: logp_old/logp_new stay self-consistent by construction
    regardless — BOTH come from the XLA carry-threaded re-forward, not
    the kernel — so the kernel's sampling mean's offset from the
    recomputed policy is bounded off-policyness the PPO clip absorbs
    (reward parity validated, tools/validate_kernel_ppo.py rppo rows);
    and HIGHEST's ~3x larger Mosaic program crashes the relay
    compile-helper at the benchmark LSTM arch (128-hidden x T=30) even
    single-tile. Returns ``inv (T+1, m1, batch) i32``, ``actions (T,
    m1, batch) i32``, ``raw (T, m1, batch) f32``, ``reward (T, batch)
    f32``, ``demand (T, batch) i32``."""
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    if precision is None:
        precision = jax.lax.Precision.DEFAULT
    sub = block // 128
    T, m1 = params.periods, params.m1
    spec = _im_demand_spec(params)
    hidden = actor["wh"].shape[1]
    n_enc = len(actor["enc"])
    kernel = partial(_im_lstm_traj_kernel, params, T, spec, precision,
                     n_enc, hidden)

    def tspec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def wspec(a):
        shp = tuple(a.shape)
        return pl.BlockSpec(shp, lambda i, _n=len(shp): (0,) * _n,
                            memory_space=pltpu.VMEM)

    weights = [w for pair in actor["enc"] for w in pair] + [
        actor["wx"], actor["wh"], actor["bh"], actor["wm"], actor["bm"]]
    std = clipped_std(log_std)
    out_rows = [(T + 1) * m1, T * m1, T * m1, T, T]
    out_dt = [jnp.int32, jnp.int32, jnp.float32, jnp.float32, jnp.int32]
    inv, acts, raw, rew, dems = pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [wspec(w) for w in weights] + [wspec(std)],
        out_specs=[tspec(r) for r in out_rows],
        out_shape=[jax.ShapeDtypeStruct((r, batch // 128, 128), dt)
                   for r, dt in zip(out_rows, out_dt)],
        # the (hidden, lanes) H/C carries + the 4h gate intermediate +
        # (2T+1)*m1 + 2T output rows exceed the 16M default scoped-vmem
        # budget at the benchmark horizon (T=50 overflowed it by 792K)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), *weights, std)
    return dict(inv=inv.reshape(T + 1, m1, batch),
                actions=acts.reshape(T, m1, batch),
                raw=raw.reshape(T, m1, batch),
                reward=rew.reshape(T, batch),
                demand=dems.reshape(T, batch))


# ------------------- trajectory-emitting rollout (kernel experience gen)
#
# The policy-in-kernel evaluators above are returns-only by design; the
# LEARNERS still generated experience through the XLA vmap rollout, whose
# measured ceiling (~10-20M steps/s, PERFORMANCE.md) capped full PPO at
# ~7.5M trained-steps/s while the same envs stepped at 1.9B+ under the
# in-kernel actor. This kernel closes that gap: it runs ONE full episode
# per lane under the STOCHASTIC MLP actor (mean on the MXU, exploration
# noise from the in-kernel Box-Muller sampler — networks.gaussian_sample
# semantics) and WRITES the training streams to HBM:
#
#   inv     ((T+1)*m1 rows, i32)  start-of-period on-hand + final snapshot
#   actions (T*m1 rows, i32)      the env-consumed squashed ints
#   raw     (T*m1 rows, f32)      pre-squash Gaussian samples (for logp)
#   reward  (T rows, f32)         alpha^t-discounted period profit
#                                 (reference reward semantics,
#                                 inventory_management.py:322)
#
# That is "enough state to reconstruct" the full PPO batch: the
# observation stream is a pure (static-index) function of inv + the
# requested-action history (envs/inv_management._obs), assembled in XLA by
# agents.ppo.assemble_im_obs with zero per-step device round-trips, and
# logp/values are recomputed there in one batched forward — self-consistent
# across SGD epochs by construction (the kernel's matmuls default to
# HIGHEST precision so the recomputed mean matches the sampling mean to
# ~1e-6). This replaces the rollout phase of model.learn
# (reference benchmark_InvManagementBacklogEnv.py:298).

def _im_traj_kernel(params: InvManagementParams, num_steps, spec, act_name,
                    policy_mode, precision, n_layers, *refs):
    seed_ref = refs[0]
    Ws_refs = refs[1:1 + n_layers]
    bs_refs = refs[1 + n_layers:1 + 2 * n_layers]
    std_ref = refs[1 + 2 * n_layers]
    inv_ref, acts_ref, raw_ref, rew_ref, dems_ref = refs[2 + 2 * n_layers:]
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    m1, lt = params.m1, params.lt_max
    tile = rew_ref.shape[1:]
    zero = jnp.zeros(tile, jnp.int32)
    inv = [jnp.full(tile, int(i0), jnp.int32) for i0 in params.I0]
    bkl = [zero for _ in range(params.num_stages)]
    RH = [zero for _ in range(lt * m1)]
    AH = [zero for _ in range(lt * m1)]
    for t in range(num_steps):
        # PRNG order per period: demand draw, then one (m1, lanes) noise
        # draw (two uniforms)
        dems = _im_sample_demand(params, tile, t, spec, 1)
        dems_ref[t] = dems[0]
        for i in range(m1):
            inv_ref[t * m1 + i] = inv[i]
        obs_rows = _im_obs_rows(params, t, inv, AH)
        store, a_norm = traj_policy(policy_mode, act_name, m1, Ws_refs,
                                    bs_refs, std_ref, precision, obs_rows)
        S = a_norm + 1.0
        acts = []
        for i in range(m1):
            raw_ref[t * m1 + i] = store[i:i + 1].reshape(tile)
            a = (S[i:i + 1] * (0.5 * float(params.c[i]))
                 ).astype(jnp.int32).reshape(tile)
            acts_ref[t * m1 + i] = a
            acts.append(a)
        inv, bkl, RH, r_req, profit = _im_step_math(
            params, t, inv, bkl, RH, acts, dems[0])
        if lt:
            AH = r_req + AH[: (lt - 1) * m1]
        rew_ref[t] = (params.alpha ** t) * profit
    for i in range(m1):  # final snapshot: the bootstrap obs's on-hand
        inv_ref[num_steps * m1 + i] = inv[i]


def rollout_traj_im(params: InvManagementParams, actor, log_std, seed,
                    batch: int, block: int = 1024, interpret: bool = False,
                    precision=None, policy: str = "ppo",
                    act_name: str = "tanh"):
    """One full stochastic-policy episode per lane with the training
    streams written to HBM (see the section comment above).

    ``actor`` is ``(Ws, bs)`` from ``fold_actor_params`` (obs normalization
    pre-folded); ``log_std`` the trained per-action-dim parameter. Matmuls
    default to HIGHEST precision (keeps the in-kernel sampling mean as
    close as Mosaic can get to the XLA-recomputed policy mean; logp_old/
    logp_new self-consistency holds regardless — see
    agents.ppo.apply_actor_critic's precision contract). Returns a dict:
    ``inv (T+1, m1, batch) i32``, ``actions (T, m1, batch) i32``,
    ``raw (T, m1, batch) f32``, ``reward (T, batch) f32``,
    ``demand (T, batch) i32``.
    Pinned on hardware by tests/test_kernel_rollout.py: the dumped
    action/demand streams replay through the XLA step_with_demand chain
    (obs, rewards, final inventory — bit-exact int state).

    ``policy``/``act_name`` select the in-kernel policy head
    (`traj_policy`): the default ``("ppo", "tanh")`` is the PPO/A2C
    recipe; ``("det"|"sac"|"uniform", "relu")`` are the off-policy
    collection modes (agents/off_policy, OffPolicyConfig(collect=
    "kernel")), where the dumped ``raw`` stream holds the NORMALIZED
    [-1, 1] actions the replay buffer stores instead of pre-squash
    samples."""
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    sub = block // 128
    T = params.periods
    m1 = params.m1
    Ws, bs = actor
    spec = _im_demand_spec(params)
    kernel = partial(_im_traj_kernel, params, T, spec, act_name, policy,
                     precision, len(Ws))

    def tspec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def wspec(a):
        shp = tuple(a.shape)
        return pl.BlockSpec(shp, lambda i, _n=len(shp): (0,) * _n,
                            memory_space=pltpu.VMEM)

    out_rows = [(T + 1) * m1, T * m1, T * m1, T, T]
    out_dt = [jnp.int32, jnp.int32, jnp.float32, jnp.float32, jnp.int32]
    Ws2 = [w.T for w in Ws]
    bs2 = [b.reshape(-1, 1) for b in bs]
    std = clipped_std(log_std)
    inv, acts, raw, rew, dems = pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [wspec(w) for w in Ws2] + [wspec(b) for b in bs2] + [wspec(std)],
        out_specs=[tspec(r) for r in out_rows],
        out_shape=[jax.ShapeDtypeStruct((r, batch // 128, 128), dt)
                   for r, dt in zip(out_rows, out_dt)],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), *Ws2, *bs2, std)
    return dict(inv=inv.reshape(T + 1, m1, batch),
                actions=acts.reshape(T, m1, batch),
                raw=raw.reshape(T, m1, batch),
                reward=rew.reshape(T, batch),
                demand=dems.reshape(T, batch))


def _nv_traj_kernel(params: NewsvendorParams, num_steps, K, chunk,
                    act_name, policy_mode, precision, n_layers, *refs):
    """Newsvendor trajectory-emitting rollout: reset econ, per-lane
    dynamic-mu Poisson demand, stochastic MLP actor — all on-core; dumps
    econ (5 rows), capped orders, pre-squash raws, UNdiscounted rewards
    and demand (T rows each). Same design as `_im_traj_kernel`; the obs
    stream is [econ, pipeline] where pipeline row j at period t is the
    capped order of period t-L+j (zero before the episode), so
    (econ, orders) reconstruct it exactly
    (envs/newsvendor.assemble_obs_from_streams)."""
    seed_ref = refs[0]
    Ws_refs = refs[1:1 + n_layers]
    bs_refs = refs[1 + n_layers:1 + 2 * n_layers]
    std_ref = refs[1 + 2 * n_layers]
    econ_ref, ord_ref, raw_ref, rew_ref, dems_ref = refs[2 + 2 * n_layers:]
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    tile = rew_ref.shape[1:]
    L = params.lead_time
    hi = float(params.max_order_quantity)
    econ = _nv_econ_from_uniforms(params, _uniform01((5,) + tile))
    for i in range(5):
        econ_ref[i] = econ[i]
    setup = _nv_poisson_setup(params, econ[4])
    price, cost, h, k, mu = econ
    P = [jnp.zeros(tile, jnp.float32) for _ in range(L)]
    for t0 in range(0, num_steps, chunk):
        n = min(chunk, num_steps - t0)
        du = _uniform01((n,) + tile)
        ds = _nv_poisson_invert(*setup, K, [du[i] for i in range(n)])
        for i in range(n):
            t = t0 + i
            obs_rows = [price, cost, h, k, mu] + P
            store, a_norm = traj_policy(policy_mode, act_name, 1, Ws_refs,
                                        bs_refs, std_ref, precision,
                                        obs_rows)
            raw_ref[t] = store[0:1].reshape(tile)
            order_raw = ((a_norm[0:1] + 1.0) * (0.5 * hi)).reshape(tile)
            P, reward, qty = _nv_step_math(params, P, price, cost, h, k,
                                           order_raw, ds[i])
            ord_ref[t] = qty
            rew_ref[t] = reward            # undiscounted (env semantics)
            dems_ref[t] = ds[i]


def rollout_traj_nv(params: NewsvendorParams, actor, log_std, seed,
                    batch: int, block: int = 1024, demand_chunk: int = 16,
                    interpret: bool = False, precision=None,
                    policy: str = "ppo", act_name: str = "tanh"):
    """One full stochastic-policy Newsvendor episode per lane with the
    training streams written to HBM. Returns a dict: ``econ (5, batch)``,
    ``orders (T, batch)`` (post-cap order quantities — the obs pipeline
    stream), ``raw (T, 1, batch)``, ``reward (T, batch)`` (undiscounted,
    env semantics), ``demand (T, batch)``, all float32. Consumed by
    ``PPOConfig(rollout="kernel")`` on the newsvendor family;
    ``policy``/``act_name`` select the in-kernel policy head
    (`traj_policy` — off-policy collection modes dump the normalized
    [-1, 1] action stream in the ``raw`` slot)."""
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    sub = block // 128
    T = params.step_limit
    _Wb, K, _lg = _nv_window(params)
    Ws, bs = actor
    kernel = partial(_nv_traj_kernel, params, T, K, demand_chunk,
                     act_name, policy, precision, len(Ws))

    def tspec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def wspec(a):
        shp = tuple(a.shape)
        return pl.BlockSpec(shp, lambda i, _n=len(shp): (0,) * _n,
                            memory_space=pltpu.VMEM)

    out_rows = [5, T, T, T, T]
    Ws2 = [w.T for w in Ws]
    bs2 = [b.reshape(-1, 1) for b in bs]
    std = clipped_std(log_std)
    econ, orders, raw, rew, dems = pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [wspec(w) for w in Ws2] + [wspec(b) for b in bs2] + [wspec(std)],
        out_specs=[tspec(r) for r in out_rows],
        out_shape=[jax.ShapeDtypeStruct((r, batch // 128, 128), jnp.float32)
                   for r in out_rows],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), *Ws2, *bs2, std)
    return dict(econ=econ.reshape(5, batch),
                orders=orders.reshape(T, batch),
                raw=raw.reshape(T, 1, batch),
                reward=rew.reshape(T, batch),
                demand=dems.reshape(T, batch))


def sample_normals_debug(seed, rows: int, batch: int, block: int = 1024,
                         interpret: bool = False):
    """(rows, batch) float32 of in-kernel Box-Muller standard normals —
    the exact `_normal01` stream the stochastic policy/trajectory kernels
    consume, dumped for goodness-of-fit pinning (one (rows, sub, 128) draw
    per tile: two uniforms per normal, u1 then u2)."""
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    sub = block // 128

    def kern(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        out_ref[...] = _normal01(out_ref.shape)

    out = pl.pallas_call(
        kern, grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, batch // 128, 128),
                                       jnp.float32),
        interpret=interpret)(jnp.asarray(seed, jnp.int32).reshape(1))
    return out.reshape(rows, batch)


def sample_streams_debug_im(params: InvManagementParams, seed, batch: int,
                            block: int = 2048, interpret: bool = False,
                            episodes_per_lane: int = 1):
    """The exact action/demand streams episode_returns_im_fused consumes for
    ``seed`` (same ``block`` and ``episodes_per_lane`` required — PRNG
    consumption is per-tile and per-draw-shape).
    Returns (actions (T, m1, batch) i32, demands (T, batch) i32) for
    episodes_per_lane=1, else (T, E, m1, batch) / (T, E, batch)."""
    assert batch % block == 0 and block % 1024 == 0, (batch, block)
    sub = block // 128
    E = episodes_per_lane
    T, m1 = params.periods, params.m1
    spec = _im_demand_spec(params)
    kernel = partial(_im_streams_debug_kernel, params, T, spec, E)

    def ospec(rows):
        return pl.BlockSpec((rows, sub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    acts, dems = pl.pallas_call(
        kernel,
        grid=(batch // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[ospec(T * E * m1), ospec(T * E)],
        out_shape=[
            jax.ShapeDtypeStruct((T * E * m1, batch // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((T * E, batch // 128, 128), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1))
    if E == 1:
        return (acts.reshape(T, m1, batch), dems.reshape(T, batch))
    return (acts.reshape(T, E, m1, batch), dems.reshape(T, E, batch))
