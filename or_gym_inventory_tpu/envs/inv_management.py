"""Serial multi-echelon inventory management — TPU-native pure-function form.

Behavioral spec: reference inventory_management.py:19-451
(InvManagementMasterEnv + Backlog/LostSales subclasses). The event sequence of
``step`` (inventory_management.py:224-352) is reproduced operation-for-
operation, including reference quirks that a redesign might "fix":

- the observation encodes *requested* (not fulfilled) orders
  (inventory_management.py:268, 380-383) and excludes backlog (:385-388);
- supplier stages 1..m-2 are decremented by ``R_fulfill[1:]`` (the orders
  those stages *placed*), not by what they shipped
  (inventory_management.py:300) — so on-hand inventory can go negative even
  in lost-sales mode; holding cost clamps at 0 (:318);
- float actions truncate toward zero via the int cast
  (inventory_management.py:250);
- the reward itself is discounted by alpha**t (inventory_management.py:322).

Design notes (TPU): per-stage arrays are tiny (m-1 = 3 by default); lead-time
arrivals are static-index reads of a newest-first rolling fulfilled-order
buffer (lead times are static config, so the gather unrolls at trace time —
no dynamic shapes). Backlog-vs-lost-sales is a static bool in params, not a
subclass. All arithmetic is int32 (obs bound cap*periods*2 ≈ 5e4 per the
reference's own heuristic bound, inventory_management.py:121 — far inside
int32), which is TPU-native; the host adapter re-exposes int64 spaces for
drop-in Gymnasium compatibility.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from or_gym_inventory_tpu.core.config import apply_env_config
from or_gym_inventory_tpu.core.spaces import Box
from or_gym_inventory_tpu.core.struct import TimeStep
from or_gym_inventory_tpu.envs.base import Environment
from or_gym_inventory_tpu.ops import distributions as dist_ops


@struct.dataclass
class InvManagementParams:
    """Static config mirroring reference __init__ kwargs
    (inventory_management.py:48-100). Sequence fields are tuples so the
    params object is hashable — each distinct config is its own XLA
    specialization with all constants folded."""

    periods: int = struct.field(pytree_node=False, default=30)
    I0: Tuple[int, ...] = struct.field(pytree_node=False, default=(100, 150, 200))
    p: float = struct.field(pytree_node=False, default=20.0)
    r: Tuple[float, ...] = struct.field(pytree_node=False, default=(15.0, 10.0, 7.0, 5.0))
    k: Tuple[float, ...] = struct.field(pytree_node=False, default=(0.10, 0.075, 0.05, 0.025))
    h: Tuple[float, ...] = struct.field(pytree_node=False, default=(0.15, 0.10, 0.05))
    c: Tuple[int, ...] = struct.field(pytree_node=False, default=(100, 200, 230))
    L: Tuple[int, ...] = struct.field(pytree_node=False, default=(1, 5, 10))
    backlog: bool = struct.field(pytree_node=False, default=True)
    dist: int = struct.field(pytree_node=False, default=1)
    dist_param: Tuple[Tuple[str, float], ...] = struct.field(
        pytree_node=False, default=(("mu", 20),))
    alpha: float = struct.field(pytree_node=False, default=0.97)
    user_D: Tuple[int, ...] = struct.field(pytree_node=False, default=())

    # ---- derived static properties (inventory_management.py:86-100) ----
    @property
    def num_stages(self) -> int:
        return len(self.I0) + 1

    @property
    def m1(self) -> int:  # stages that hold inventory / place orders
        return self.num_stages - 1

    @property
    def lt_max(self) -> int:
        return 0 if self.num_stages <= 1 else int(max(self.L))

    @property
    def pipeline_length(self) -> int:
        return self.m1 * (self.lt_max + 1)

    @property
    def horizon(self) -> int:
        return self.periods

    @property
    def dist_param_dict(self) -> Dict:
        return dict(self.dist_param)

    @property
    def unit_price(self) -> np.ndarray:  # price received by stage i (m,)
        return np.append(self.p, self.r[:-1]).astype(np.float32)

    @property
    def unit_cost(self) -> np.ndarray:  # procurement cost of stage i (m,)
        return np.array(self.r, np.float32)

    @property
    def holding_cost_vec(self) -> np.ndarray:  # (m,), 0 at last stage
        return np.append(self.h, 0.0).astype(np.float32)

    @property
    def obs_bound(self) -> int:  # reference heuristic bound (:121)
        return int(np.sum(self.c) * self.periods * 2)

    def validate(self):
        """Mirrors reference _validate_inputs (inventory_management.py:144-167)."""
        m = self.num_stages
        assert all(i >= 0 for i in self.I0), "Initial inventory cannot be negative"
        assert self.periods > 0, "Number of periods must be positive"
        assert all(v >= 0 for v in self.unit_price), "Sales prices cannot be negative"
        assert all(v >= 0 for v in self.r), "Procurement costs cannot be negative"
        assert all(v >= 0 for v in self.k), "Unfulfilled demand costs cannot be negative"
        assert all(v >= 0 for v in self.holding_cost_vec), "Holding costs cannot be negative"
        assert all(v > 0 for v in self.c), "Supply capacities must be positive"
        assert all(v >= 0 for v in self.L), "Lead times cannot be negative"
        assert isinstance(self.backlog, bool), "Backlog parameter must be boolean"
        assert m >= 2, "Minimum number of stages is 2"
        assert len(self.r) == m and len(self.k) == m
        assert len(self.h) == m - 1, f"Length of h ({len(self.h)}) != num stages - 1 ({m-1})"
        assert len(self.c) == m - 1 and len(self.L) == m - 1
        assert self.dist in (1, 2, 3, 4, 5), "dist must be one of 1..5"
        if self.dist == 5:
            assert len(self.user_D) == self.periods, \
                "User specified demand length != num periods"
        self._validate_dist_param()
        assert 0 < self.alpha <= 1, "alpha must be in the range (0, 1]"
        return self

    def _validate_dist_param(self):
        """Per-dist required keys + value ranges, so a wrong dict raises a
        clear constructor error instead of a KeyError deep inside a jitted
        sampler (reference validates at inventory_management.py:144-167 but
        skips dist_param contents — 'Scipy validation is complex')."""
        dp = self.dist_param_dict
        required = {1: ("mu",), 2: ("n", "p"), 3: ("low", "high"),
                    4: ("p",), 5: ()}[self.dist]
        missing = [k for k in required if k not in dp]
        assert not missing, (
            f"dist={self.dist} requires dist_param keys {list(required)}; "
            f"missing {missing} (got {sorted(dp)})")
        if self.dist != 5:
            extra = sorted(set(dp) - set(required))
            assert not extra, (
                f"dist={self.dist} takes dist_param keys {list(required)}; "
                f"unexpected {extra}")
        if self.dist == 1:
            assert dp["mu"] >= 0, f"Poisson mu must be >= 0, got {dp['mu']}"
        elif self.dist == 2:
            assert dp["n"] >= 0 and float(dp["n"]).is_integer(), \
                f"Binomial n must be a non-negative integer, got {dp['n']}"
            assert 0 <= dp["p"] <= 1, f"Binomial p must be in [0, 1], got {dp['p']}"
        elif self.dist == 3:
            assert dp["low"] <= dp["high"], (
                f"Uniform-integer requires low <= high, got "
                f"low={dp['low']}, high={dp['high']}")
        elif self.dist == 4:
            assert 0 < dp["p"] <= 1, f"Geometric p must be in (0, 1], got {dp['p']}"


_ALIASES = {}


def default_params(env_config=None, backlog: Optional[bool] = None,
                   **kwargs) -> InvManagementParams:
    """Build params with reference-style dict overrides.

    ``backlog=True/False`` corresponds to the reference's
    InvManagementBacklogEnv / InvManagementLostSalesEnv subclasses
    (inventory_management.py:429-451); here it's just a param.
    """
    for seq_key in ("I0", "r", "k", "h", "c", "L", "user_D"):
        if seq_key in kwargs:
            kwargs[seq_key] = tuple(kwargs[seq_key])
    if "dist_param" in kwargs and isinstance(kwargs["dist_param"], dict):
        kwargs["dist_param"] = tuple(sorted(kwargs["dist_param"].items()))
    if env_config:
        env_config = dict(env_config)
        for seq_key in ("I0", "r", "k", "h", "c", "L", "user_D"):
            if seq_key in env_config:
                env_config[seq_key] = tuple(env_config[seq_key])
        if "dist_param" in env_config and isinstance(env_config["dist_param"], dict):
            env_config["dist_param"] = tuple(sorted(env_config["dist_param"].items()))
    params = InvManagementParams(**kwargs)
    params = apply_env_config(params, env_config, _ALIASES)
    if backlog is not None:
        params = params.replace(backlog=backlog)
    return params.validate()


@struct.dataclass
class InvManagementState:
    inv: jax.Array          # (m-1,) i32 on-hand at start of period t (I[t])
    backlog_v: jax.Array    # (m,) i32 backlog at start of period t (B[t])
    action_hist: jax.Array  # (lt_max, m-1) i32 requested orders, newest-first
    r_hist: jax.Array       # (lt_max, m-1) i32 fulfilled orders, newest-first
    period: jax.Array       # i32 scalar


def observation_space(params: InvManagementParams) -> Box:
    n, bound = params.pipeline_length, params.obs_bound
    low = (-bound if params.backlog else 0) * np.ones(n, np.int32)
    return Box(low=low, high=bound * np.ones(n, np.int32), dtype=np.int32)


def action_space(params: InvManagementParams) -> Box:
    return Box(low=np.zeros(params.m1, np.int32),
               high=np.array(params.c, np.int32), dtype=np.int32)


def _obs(params: InvManagementParams, state: InvManagementState) -> jax.Array:
    """Reference obs layout (inventory_management.py:354-391): on-hand I[t]
    first, then the last min(t, lt_max) *requested* actions chronologically,
    zero-padded at the END when t < lt_max."""
    m1, lt_max = params.m1, params.lt_max
    if lt_max == 0:
        return state.inv
    # newest-first buffer -> chronological (oldest of window first)
    chron = state.action_hist[::-1]  # row j = action at period t - lt_max + j
    # When t < lt_max the first (lt_max - t) rows are zeros from init; the
    # reference packs valid actions at the FRONT instead — rotate them up.
    shift = jnp.maximum(0, lt_max - state.period)
    chron = jnp.roll(chron, -shift, axis=0)
    return jnp.concatenate([state.inv, chron.reshape(-1)])


def assemble_obs_from_streams(params: InvManagementParams, inv, actions):
    """Reconstruct the full observation stream from rollout streams —
    the gather form of ``_obs`` over a whole episode, with zero per-step
    device round-trips (this is how the trajectory-emitting Pallas rollout
    feeds the PPO update, ops/pallas_episode_kernels.rollout_traj_im).

    ``inv`` (T+1, m1, B) i32 start-of-period on-hand (final snapshot last);
    ``actions`` (T, m1, B) i32 the per-period orders (clamped to the
    REQUESTED values ``max(a, 0)`` here, matching the history the obs
    encodes — inventory_management.py:268). Returns (T+1, B,
    pipeline_length) i32 where row t == ``_obs`` of the period-t state:
    on-hand first, then the last min(t, lt_max) requested actions
    chronologically, zero-padded at the END when t < lt_max."""
    import numpy as np
    T1, m1, B = inv.shape
    T = T1 - 1
    lt = params.lt_max
    if lt == 0:
        return inv.transpose(0, 2, 1)
    req = jnp.maximum(jnp.asarray(actions, jnp.int32), 0)
    padded = jnp.concatenate(
        [req, jnp.zeros((1, m1, B), jnp.int32)], axis=0)  # row T = zeros
    # chron slot j of obs row t reads action t - w + j for w = min(t, lt)
    # valid slots, else the zero row — a static gather table
    idx = np.full((T1, lt), T, np.int32)
    for t in range(T1):
        w = min(t, lt)
        idx[t, :w] = np.arange(t - w, t)
    hist = padded[jnp.asarray(idx)]                       # (T+1, lt, m1, B)
    obs = jnp.concatenate([inv, hist.reshape(T1, lt * m1, B)], axis=1)
    return obs.transpose(0, 2, 1)


def _info(params, state):
    return {
        "period": state.period,
        "current_inventory_on_hand": state.inv,
        "current_backlog": state.backlog_v,
    }


def reset(params: InvManagementParams, key: jax.Array = None):
    """Zero histories, I[0] = I0 (inventory_management.py:186-222). Demand is
    sampled in step, so reset consumes no randomness (key accepted for API
    uniformity)."""
    m1, lt = params.m1, params.lt_max
    state = InvManagementState(
        inv=jnp.asarray(params.I0, jnp.int32),
        backlog_v=jnp.zeros((params.num_stages,), jnp.int32),
        action_hist=jnp.zeros((lt, m1), jnp.int32),
        r_hist=jnp.zeros((lt, m1), jnp.int32),
        period=jnp.zeros((), jnp.int32))
    ts = TimeStep(obs=_obs(params, state), reward=jnp.zeros((), jnp.float32),
                  terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
                  info=_info(params, state))
    return state, ts


def step_with_demand(params: InvManagementParams, state: InvManagementState,
                     action: jax.Array, demand: jax.Array):
    """One period with injected demand; event order per
    inventory_management.py:224-352."""
    m, m1 = params.num_stages, params.m1
    t = state.period
    c = jnp.asarray(params.c, jnp.int32)
    L = params.L  # static ints

    # --- 0) place replenishment orders (:245-268) ---
    # float actions truncate toward zero, then clamp at 0 (reference order is
    # max-then-cast; for negative floats both give 0, for positives identical)
    r_requested = jnp.maximum(jnp.asarray(action).astype(jnp.int32), 0)
    order_request = r_requested + state.backlog_v[1:]  # B[t, 1:] zero at t=0
    # supplier on-hand caps: stage i's order capped by I[t, i+1]; last stage
    # draws from infinite raw material (:260-265)
    supplier_inv = jnp.concatenate(
        [state.inv[1:], jnp.full((1,), jnp.iinfo(jnp.int32).max, jnp.int32)])
    r_fulfill = jnp.minimum(jnp.minimum(order_request, c), supplier_inv)

    # --- 1) receive shipments ordered L_i periods ago (:272-277) ---
    inv_cur = state.inv
    arrivals = []
    for i in range(m1):
        li = int(L[i])
        if li == 0:
            due = r_fulfill[i]  # same-period arrival (t - 0 >= 0 always)
        else:
            due = jnp.where(t >= li, state.r_hist[li - 1, i], 0)
        arrivals.append(due)
    arrivals = jnp.stack(arrivals)
    inv_cur = inv_cur + arrivals

    # --- 2) customer demand (:280-281) ---
    d = jnp.maximum(jnp.asarray(demand, jnp.int32), 0)

    # --- 3) fill retailer demand incl. prior backlog (:284-289) ---
    demand_to_fill = d + state.backlog_v[0]
    sales0 = jnp.minimum(inv_cur[0], demand_to_fill)
    inv_cur = inv_cur.at[0].add(-sales0)

    # --- 4) sales/unfulfilled per supplier stage (:292-304) ---
    S = jnp.concatenate([sales0[None], r_fulfill])  # (m,)
    # reference decrements stages 1..m-2 by R_fulfill[1:] (orders they
    # *placed*) — preserved verbatim (:300)
    inv_cur = inv_cur.at[1:].add(-r_fulfill[1:])
    U = jnp.concatenate([(demand_to_fill - sales0)[None],
                         order_request - r_fulfill])  # (m,)

    if params.backlog:
        new_backlog = U
    else:
        new_backlog = jnp.zeros_like(U)

    # --- 5) profit (:315-323) ---
    Sf = S.astype(jnp.float32)
    revenue = jnp.asarray(params.unit_price) * Sf
    procurement = jnp.asarray(params.unit_cost) * Sf
    holding = jnp.asarray(params.holding_cost_vec) * jnp.maximum(
        0, jnp.concatenate([inv_cur, jnp.zeros(1, jnp.int32)])).astype(jnp.float32)
    penalty = jnp.asarray(params.k, jnp.float32) * U.astype(jnp.float32)
    period_profit = jnp.sum(revenue - procurement - holding - penalty)
    reward = (params.alpha ** t.astype(jnp.float32)) * period_profit

    # --- history buffers roll (newest-first) ---
    if params.lt_max > 0:
        action_hist = jnp.concatenate(
            [r_requested[None], state.action_hist[:-1]], axis=0)
        r_hist = jnp.concatenate([r_fulfill[None], state.r_hist[:-1]], axis=0)
    else:
        action_hist, r_hist = state.action_hist, state.r_hist

    new_state = InvManagementState(
        inv=inv_cur, backlog_v=new_backlog, action_hist=action_hist,
        r_hist=r_hist, period=t + 1)
    truncated = new_state.period >= params.periods

    info = _info(params, new_state)
    info.update(
        period_profit=period_profit,
        revenue=jnp.sum(revenue), procurement_cost=jnp.sum(procurement),
        holding_cost=jnp.sum(holding), penalty_cost=jnp.sum(penalty),
        demand_realized=d, sales=S, unfulfilled=U,
        ending_inventory=inv_cur, backlog_start_of_next=new_backlog,
        fulfilled_orders=r_fulfill, requested_orders=r_requested)
    ts = TimeStep(obs=_obs(params, new_state), reward=reward,
                  terminated=jnp.zeros((), bool), truncated=truncated, info=info)
    return new_state, ts


def step(params: InvManagementParams, state: InvManagementState,
         action: jax.Array, key: jax.Array):
    sampler = dist_ops.make_demand_sampler(
        params.dist, params.dist_param_dict, params.user_D)
    demand = sampler(key, state.period)
    return step_with_demand(params, state, action, demand)


ENV = Environment(
    name="inv_management",
    default_params=default_params,
    reset=reset,
    step=step,
    step_with_demand=step_with_demand,
    observation_space=observation_space,
    action_space=action_space,
)
