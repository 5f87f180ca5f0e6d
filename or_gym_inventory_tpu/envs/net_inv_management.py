"""Graph-structured network inventory management — TPU-native form.

Behavioral spec: reference network_management.py:26-770 (NetInvMgmtMasterEnv
+ Backlog/LostSales subclasses) and network_management_custom.py (same class,
different default graph). The reference's pandas/NetworkX step loop
(network_management.py:436-635, measured ~78 steps/s) becomes pure array
arithmetic over tensors compiled once from the graph (envs/topology.py); the
per-link loops unroll at trace time (links are static), so XLA sees one flat
fused kernel per step — and vmap batches thousands of instances.

Ordering semantics preserved exactly:
- reorder links fulfill in sorted-edge order with *sequential* supplier
  contention via a running consumed tally (network_management.py:446-485);
  factory caps are min(C, v * remaining-inventory) applied per order, not per
  period (:470-478, acknowledged in reference comments);
- retail links fill in declaration order, sequentially decrementing a
  temporary inventory copy (:536-554);
- lost-sales mode zeroes U[t+1] (:563) and the retail penalty reads U[t+1]
  (:608) — so no stockout penalty is ever charged in lost-sales mode. This
  reference quirk is preserved for parity (see SURVEY.md §2.2 watchlist).
- actions and demands are rounded (banker's rounding, matching Python/NumPy
  ``round``) and clamped non-negative (:449, :540).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from or_gym_inventory_tpu.core.spaces import Box
from or_gym_inventory_tpu.core.struct import TimeStep
from or_gym_inventory_tpu.envs.base import Environment
from or_gym_inventory_tpu.envs import topology as topo_mod
from or_gym_inventory_tpu.envs.topology import Topology
from or_gym_inventory_tpu.ops import distributions as D
from or_gym_inventory_tpu.ops.distributions import sample_poisson


@struct.dataclass
class NetInvParams:
    topology: Topology = struct.field(pytree_node=False)
    num_periods: int = struct.field(pytree_node=False, default=30)
    backlog: bool = struct.field(pytree_node=False, default=True)
    alpha: float = struct.field(pytree_node=False, default=1.0)

    @property
    def horizon(self) -> int:
        return self.num_periods

    @property
    def obs_dim(self) -> int:
        return self.topology.obs_dim

    def validate(self):
        assert isinstance(self.backlog, bool), "backlog must be boolean"
        assert 0 < self.alpha <= 1, "alpha must be in (0, 1]"
        assert self.num_periods > 0, "num_periods must be positive"
        return self


def default_params(env_config=None, graph=None, topology: Optional[Topology] = None,
                   num_periods: int = 30, backlog: bool = True, alpha: float = 1.0,
                   user_D=None, sample_path=None) -> NetInvParams:
    """Build params; mirrors NetInvMgmtMasterEnv.__init__
    (network_management.py:55-106) incl. the env_config override path and the
    'graph' special case (network_management.py:17-24)."""
    cfg = dict(env_config or {})
    num_periods = int(cfg.pop("num_periods", num_periods))
    backlog = bool(cfg.pop("backlog", backlog))
    alpha = float(cfg.pop("alpha", alpha))
    graph = cfg.pop("graph", graph)
    user_D = cfg.pop("user_D", user_D)
    sample_path = cfg.pop("sample_path", sample_path)
    if cfg:
        raise KeyError(f"Unknown env_config keys for NetInvParams: {sorted(cfg)}")
    if topology is None:
        if graph is not None:
            topology = topo_mod.from_networkx(graph, num_periods,
                                              user_D=user_D, sample_path=sample_path)
        else:
            topology = topo_mod.default_topology(num_periods,
                                                 user_D=user_D, sample_path=sample_path)
    return NetInvParams(topology=topology, num_periods=num_periods,
                        backlog=backlog, alpha=alpha).validate()


@struct.dataclass
class NetInvState:
    X: jax.Array       # (n_main,) f32 on-hand at start of period t
    Y: jax.Array       # (n_reorder,) f32 pipeline at start of period t
    U: jax.Array       # (n_retail,) f32 unfulfilled demand at start of t
    r_hist: jax.Array  # (lt_max, n_reorder) f32 fulfilled orders, newest-first
    period: jax.Array  # i32 scalar


def observation_space(params: NetInvParams) -> Box:
    """network_management.py:283-298 (+ lost-sales low clamp :762-770)."""
    T = params.topology
    hi = T.order_cap_heuristic * params.num_periods * 2
    lo = 0.0 if not params.backlog else -hi
    low = np.full(T.obs_dim, lo, np.float32)
    low[:T.n_retail] = 0.0
    return Box(low=low, high=np.full(T.obs_dim, hi, np.float32), dtype=np.float32)


def action_space(params: NetInvParams) -> Box:
    T = params.topology
    hi = T.order_cap_heuristic * 2
    return Box(low=np.zeros(T.n_reorder, np.float32),
               high=np.full(T.n_reorder, hi, np.float32), dtype=np.float32)


def _obs(params: NetInvParams, state: NetInvState) -> jax.Array:
    """[U[t] per retail link, X[t] per main node, per-reorder-link order
    windows R[t-L..t-1] (zeros at the front when t < L)] —
    network_management.py:334-413."""
    T = params.topology
    parts = [state.U, state.X]
    for i, L in enumerate(T.ro_L):
        if L == 0:
            continue
        # newest-first buffer -> chronological window of length L
        parts.append(state.r_hist[:L, i][::-1])
    return jnp.concatenate(parts) if parts else jnp.zeros((0,), jnp.float32)


def assemble_obs_from_streams(params: NetInvParams, x, u, r):
    """Reconstruct the full observation stream from rollout streams — the
    gather form of ``_obs`` over a whole episode (the network-family
    analogue of inv_management.assemble_obs_from_streams, feeding the PPO
    update from ops/pallas_net_step.rollout_traj_net).

    ``x`` (T+1, n_main, B) / ``u`` (T+1, n_rt, B) start-of-period node
    inventories and retail backlogs; ``r`` (T, n_ro, B) fulfilled orders.
    Returns (T+1, B, obs_dim) f32 where row t == ``_obs`` of the period-t
    state: U first, then X, then per reorder link i the chronological
    window ``r[t-L_i .. t-1, i]`` (zeros before the episode; L_i == 0
    links contribute no rows)."""
    import numpy as np
    T = params.topology
    T1 = x.shape[0]
    Tn = T1 - 1
    B = x.shape[2]
    parts = [jnp.asarray(u, jnp.float32), jnp.asarray(x, jnp.float32)]
    padded = jnp.concatenate(
        [jnp.asarray(r, jnp.float32),
         jnp.zeros((1, T.n_reorder, B), jnp.float32)], axis=0)
    for i, L in enumerate(T.ro_L):
        if L == 0:
            continue
        idx = np.full((T1, L), Tn, np.int32)
        for t in range(T1):
            for j in range(L):
                if 0 <= t - L + j < Tn:
                    idx[t, j] = t - L + j
        parts.append(padded[jnp.asarray(idx), i])     # (T+1, L, B)
    return jnp.concatenate(parts, axis=1).transpose(0, 2, 1)


def _info(params, state):
    return {"period": state.period, "inventory": state.X,
            "pipeline": state.Y, "backlog_start": state.U}


def reset(params: NetInvParams, key: jax.Array = None):
    T = params.topology
    state = NetInvState(
        X=jnp.asarray(T.I0, jnp.float32),
        Y=jnp.zeros((T.n_reorder,), jnp.float32),
        U=jnp.zeros((T.n_retail,), jnp.float32),
        r_hist=jnp.zeros((max(T.lt_max, 1), T.n_reorder), jnp.float32),
        period=jnp.zeros((), jnp.int32))
    ts = TimeStep(obs=_obs(params, state), reward=jnp.zeros((), jnp.float32),
                  terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
                  info=_info(params, state))
    return state, ts


def _segment_sum(values: jax.Array, idx: np.ndarray, n: int) -> jax.Array:
    """Sum values into n node buckets; index -1 (raw-material) is dropped."""
    idx = np.where(idx < 0, n, idx)
    return jax.ops.segment_sum(values, jnp.asarray(idx), num_segments=n + 1)[:n]


def step_with_demand(params: NetInvParams, state: NetInvState,
                     action: jax.Array, demand: jax.Array):
    """One period with injected per-retail-link demand (n_retail,). Event
    order per network_management.py:436-635."""
    T = params.topology
    t = state.period
    n_main = T.n_main
    action = jnp.asarray(action, jnp.float32).reshape(-1)
    demand = jnp.asarray(demand, jnp.float32).reshape(-1)

    # --- 0) order fulfillment with sequential supplier contention (:442-490)
    requests = jnp.maximum(0.0, jnp.round(action))
    consumed = jnp.zeros((n_main,), jnp.float32)
    r_cur = []
    for i in range(T.n_reorder):
        sup = T.ro_sup_main[i]
        if sup < 0:  # raw-material supplier: unlimited (:453-455)
            fulfilled = requests[i]
        else:
            remaining = state.X[sup] - consumed[sup]
            avail = jnp.maximum(0.0, remaining)
            if T.is_factory[sup]:
                # per-order capacity/yield cap (:464-478)
                avail = jnp.minimum(avail, jnp.minimum(T.C[sup], T.v[sup] * avail))
            fulfilled = jnp.minimum(requests[i], avail)
            consumed = consumed.at[sup].add(fulfilled / T.v[sup])
        r_cur.append(fulfilled)
    r_cur = jnp.stack(r_cur)  # R[t] per reorder link; S on those links == R

    # --- 1) deliveries + pipeline (:494-528) ---
    arriving = []
    for i, L in enumerate(T.ro_L):
        if L == 0:
            arriving.append(r_cur[i])  # placed and arrives this period
        else:
            arriving.append(jnp.where(t >= L, state.r_hist[L - 1, i], 0.0))
    arriving = jnp.stack(arriving)
    Y_new = state.Y - arriving + r_cur
    arrivals_node = _segment_sum(arriving, np.asarray(T.ro_pur_main), n_main)
    X_mid = state.X + arrivals_node - consumed

    # --- 2-4) market demand, sequential retail fulfillment (:532-566) ---
    d = jnp.maximum(0.0, jnp.round(demand))
    X_bms = X_mid
    sales_rt, U_new = [], []
    for j in range(T.n_retail):
        ret = T.rt_retailer_main[j]
        to_fill = d[j] + state.U[j]
        inv_r = jnp.maximum(0.0, X_bms[ret])
        s = jnp.minimum(to_fill, inv_r)
        X_bms = X_bms.at[ret].add(-s)
        sales_rt.append(s)
        unf = to_fill - s
        U_new.append(unf if params.backlog else jnp.zeros_like(unf))
    sales_rt = jnp.stack(sales_rt)
    U_new = jnp.stack(U_new)
    X_new = X_bms

    # --- 5) per-node profit (:576-619) ---
    ro_sup = np.asarray(T.ro_sup_main)
    ro_pur = np.asarray(T.ro_pur_main)
    rt_ret = np.asarray(T.rt_retailer_main)
    ro_price = jnp.asarray(T.ro_price, jnp.float32)
    rt_price = jnp.asarray(T.rt_price, jnp.float32)

    SR = (_segment_sum(ro_price * r_cur, ro_sup, n_main)
          + _segment_sum(rt_price * sales_rt, rt_ret, n_main))
    PC = _segment_sum(ro_price * r_cur, ro_pur, n_main)
    HC = (jnp.asarray(T.h, jnp.float32) * jnp.maximum(0.0, X_new)
          + _segment_sum(jnp.asarray(T.ro_g, jnp.float32) * jnp.maximum(0.0, Y_new),
                         ro_pur, n_main))
    sold_total = (_segment_sum(r_cur, ro_sup, n_main)
                  + _segment_sum(sales_rt, rt_ret, n_main))
    OC = jnp.where(jnp.asarray(T.is_factory),
                   jnp.asarray(T.o, jnp.float32) * sold_total
                   / jnp.asarray(T.v, jnp.float32), 0.0)
    UP = _segment_sum(jnp.asarray(T.rt_b, jnp.float32) * U_new, rt_ret, n_main)
    node_profit = SR - PC - OC - HC - UP
    reward = (params.alpha ** t.astype(jnp.float32)) * jnp.sum(node_profit)

    r_hist = jnp.concatenate([r_cur[None], state.r_hist[:-1]], axis=0)
    new_state = NetInvState(X=X_new, Y=Y_new, U=U_new, r_hist=r_hist,
                            period=t + 1)
    truncated = new_state.period >= params.num_periods

    info = _info(params, new_state)
    info.update(demand=d, retail_sales=sales_rt, fulfilled_orders=r_cur,
                arrivals=arrivals_node, node_profit=node_profit,
                profit_period_undiscounted=jnp.sum(node_profit),
                profit_period_discounted=reward)
    ts = TimeStep(obs=_obs(params, new_state), reward=reward,
                  terminated=jnp.zeros((), bool), truncated=truncated, info=info)
    return new_state, ts


def sample_demand(params: NetInvParams, key: jax.Array, period: jax.Array) -> jax.Array:
    """Device-side per-retail-link demand for every named spec the topology
    compiler emits (the reference's arbitrary per-edge ``demand_dist_func``
    surface, network_management.py:123-127, 240-267): poisson / binomial /
    negbinomial / randint / geometric / normal / user-array / zero. A
    ``hostfn`` spec (unrecognizable host callable) cannot compile to device
    and raises with instructions."""
    T = params.topology
    keys = jax.random.split(key, max(T.n_retail, 1))
    out = []
    for j, spec in enumerate(T.rt_demand):
        tag = spec[0]
        if tag == "poisson":
            out.append(sample_poisson(keys[j], spec[1]).astype(jnp.float32))
        elif tag == "binomial":
            out.append(D.sample_binomial(keys[j], int(spec[1]), spec[2])
                       .astype(jnp.float32))
        elif tag == "negbinomial":
            out.append(D.sample_negbinomial(keys[j], spec[1], spec[2])
                       .astype(jnp.float32))
        elif tag == "randint":
            # numpy `integers` semantics (high exclusive); device sampler
            # takes an inclusive upper bound
            out.append(D.sample_randint(keys[j], int(spec[1]),
                                        int(spec[2]) - 1).astype(jnp.float32))
        elif tag == "geometric":
            out.append(D.sample_geometric(keys[j], spec[1]).astype(jnp.float32))
        elif tag == "normal":
            out.append(D.sample_normal_rounded(keys[j], spec[1], spec[2])
                       .astype(jnp.float32))
        elif tag == "user":
            arr = jnp.asarray(spec[1], jnp.float32)
            n = arr.shape[0]
            out.append(arr[jnp.minimum(period, n - 1)])
        elif tag == "zero":
            out.append(jnp.zeros((), jnp.float32))
        else:
            raise NotImplementedError(
                f"Retail link {T.retail_links[j]}: spec {tag!r} (an arbitrary "
                "host callable) cannot compile to device — pass "
                "demand_dist=<name> (see envs.topology) or use the Gymnasium "
                "adapter, which calls the callable verbatim.")
    return jnp.stack(out)


def step(params: NetInvParams, state: NetInvState, action: jax.Array,
         key: jax.Array):
    demand = sample_demand(params, key, state.period)
    return step_with_demand(params, state, action, demand)


ENV = Environment(
    name="net_inv_management",
    default_params=default_params,
    reset=reset,
    step=step,
    step_with_demand=step_with_demand,
    observation_space=observation_space,
    action_space=action_space,
)
