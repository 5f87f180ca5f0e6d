"""Multi-period newsvendor with lead times — TPU-native pure-function form.

Behavioral spec: reference newsvendor.py:13-230 (NewsvendorEnv). Dynamics are
reproduced event-for-event, including the reference's documented quirks:

- lead_time == 0 uses the order *after* the [0, max_order] clip but *before*
  the max_inventory cap as on-hand inventory (newsvendor.py:136-142);
- purchase cost is charged on the (post-cap) order at order time, undiscounted
  (newsvendor.py:162-163);
- unsold inventory expires — on-hand each period is only the arriving pipeline
  slot (newsvendor.py:19-21, 174-183);
- reset draws 5 sequential conditional uniforms enforcing p >= c >= h
  (newsvendor.py:105-111).

Design notes (TPU): the state is 7 small arrays; one period is ~20 fused VPU
ops. Batched with vmap the whole step is a single elementwise kernel over the
batch — no MXU needed, HBM traffic is the bound, and at (10,)-float state per
env a v5e core steps millions of envs per second.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from or_gym_inventory_tpu.core.config import apply_env_config
from or_gym_inventory_tpu.core.spaces import Box
from or_gym_inventory_tpu.core.struct import TimeStep
from or_gym_inventory_tpu.envs.base import Environment
from or_gym_inventory_tpu.ops.distributions import sample_poisson

import numpy as np


@struct.dataclass
class NewsvendorParams:
    """Static config (reference __init__ kwargs, newsvendor.py:52-73)."""

    lead_time: int = struct.field(pytree_node=False, default=5)
    max_inventory: float = struct.field(pytree_node=False, default=4000.0)
    max_order_quantity: float = struct.field(pytree_node=False, default=2000.0)
    step_limit: int = struct.field(pytree_node=False, default=40)
    p_max: float = struct.field(pytree_node=False, default=100.0)
    h_max: float = struct.field(pytree_node=False, default=5.0)
    k_max: float = struct.field(pytree_node=False, default=10.0)
    mu_max: float = struct.field(pytree_node=False, default=200.0)
    gamma: float = struct.field(pytree_node=False, default=1.0)

    @property
    def obs_dim(self) -> int:
        return self.lead_time + 5

    @property
    def horizon(self) -> int:
        return self.step_limit


def default_params(env_config=None, **kwargs) -> NewsvendorParams:
    params = NewsvendorParams(**kwargs)
    params = apply_env_config(params, env_config)
    return params.replace(lead_time=max(0, params.lead_time))


@struct.dataclass
class NewsvendorState:
    econ: jax.Array       # (5,) f32: price, cost, h, k, mu (per-episode draws)
    pipeline: jax.Array   # (lead_time,) f32: pipeline[0] arrives next
    step_count: jax.Array  # i32 scalar


def observation_space(params: NewsvendorParams) -> Box:
    high = np.array(
        [params.p_max, params.p_max, params.h_max, params.k_max, params.mu_max]
        + [params.max_order_quantity] * params.lead_time, dtype=np.float32)
    return Box(low=np.zeros(params.obs_dim, np.float32), high=high, dtype=np.float32)


def action_space(params: NewsvendorParams) -> Box:
    return Box(low=np.zeros(1, np.float32),
               high=np.full(1, params.max_order_quantity, np.float32),
               dtype=np.float32)


def _obs(state: NewsvendorState) -> jax.Array:
    return jnp.concatenate([state.econ, state.pipeline])


def assemble_obs_from_streams(params: NewsvendorParams, econ, orders):
    """Reconstruct the full observation stream from rollout streams — the
    gather form of ``_obs`` over a whole episode (the newsvendor analogue
    of inv_management.assemble_obs_from_streams, feeding the PPO update
    from ops/pallas_episode_kernels.rollout_traj_nv).

    ``econ`` (5, B) f32 per-episode economics; ``orders`` (T, B) f32
    CAPPED order quantities (the values entering the pipeline). Returns
    (T+1, B, obs_dim) f32 where row t == ``_obs`` of the period-t state:
    econ first, then pipeline[j] = order of period t - lead_time + j
    (zero before the episode)."""
    import numpy as np
    T, B = orders.shape
    L = params.lead_time
    econ_b = jnp.broadcast_to(jnp.asarray(econ, jnp.float32)[None],
                              (T + 1, 5, B))
    if L == 0:
        return econ_b.transpose(0, 2, 1)
    padded = jnp.concatenate(
        [jnp.asarray(orders, jnp.float32),
         jnp.zeros((1, B), jnp.float32)], axis=0)   # row T = zeros
    idx = np.full((T + 1, L), T, np.int32)
    for t in range(T + 1):
        for j in range(L):
            if 0 <= t - L + j < T:
                idx[t, j] = t - L + j
    hist = padded[jnp.asarray(idx)]                  # (T+1, L, B)
    return jnp.concatenate([econ_b, hist], axis=1).transpose(0, 2, 1)


def _info(params: NewsvendorParams, state: NewsvendorState):
    return {
        "price": state.econ[0], "cost": state.econ[1],
        "holding_cost_rate": state.econ[2], "penalty_cost_rate": state.econ[3],
        "demand_mean": state.econ[4],
        "step_count": state.step_count,
    }


def draw_econ(params: NewsvendorParams, key: jax.Array) -> jax.Array:
    """The 5 conditional uniforms of newsvendor.py:105-111 (same formulas;
    draw order only matters for the NumPy-parity path, core/parity.py)."""
    u = jax.random.uniform(key, (5,), dtype=jnp.float32)
    price = jnp.maximum(1.0, u[0] * params.p_max)
    cost = jnp.maximum(1.0, u[1] * price)
    h = u[2] * jnp.minimum(cost, params.h_max)
    k = u[3] * params.k_max
    mu = u[4] * params.mu_max
    return jnp.stack([price, cost, h, k, mu])


def reset_with_econ(params: NewsvendorParams, econ: jax.Array):
    """Deterministic reset with pinned economics — the capability of the
    reference's CustomizableNewsvendorEnv fixed_params reset
    (benchmark_newsvendor_sb3_rllib.py:276-291)."""
    state = NewsvendorState(
        econ=jnp.asarray(econ, jnp.float32),
        pipeline=jnp.zeros((params.lead_time,), jnp.float32),
        step_count=jnp.zeros((), jnp.int32))
    ts = TimeStep(obs=_obs(state), reward=jnp.zeros((), jnp.float32),
                  terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
                  info=_info(params, state))
    return state, ts


def reset(params: NewsvendorParams, key: jax.Array):
    return reset_with_econ(params, draw_econ(params, key))


def step_with_demand(params: NewsvendorParams, state: NewsvendorState,
                     action: jax.Array, demand: jax.Array):
    """One period with an externally supplied demand (parity/user_D path).

    Event order matches newsvendor.py:125-204 exactly.
    """
    price, cost, h, k, _mu = (state.econ[i] for i in range(5))
    order_raw = jnp.clip(jnp.asarray(action, jnp.float32).reshape(-1)[0],
                         0.0, params.max_order_quantity)

    pipeline_sum = jnp.sum(state.pipeline)
    if params.lead_time > 0:
        inv_on_hand = state.pipeline[0]
    else:
        # Reference quirk: pre-inventory-cap order is instantly on hand
        # (newsvendor.py:136-142).
        inv_on_hand = order_raw
    order_qty = jnp.maximum(0.0, jnp.minimum(
        order_raw, params.max_inventory - pipeline_sum))

    d = jnp.asarray(demand, jnp.float32)
    sales = jnp.minimum(inv_on_hand, d)
    revenue = sales * price
    excess = jnp.maximum(0.0, inv_on_hand - d)
    short = jnp.maximum(0.0, d - inv_on_hand)

    purchase_cost = order_qty * cost
    holding_cost = excess * h
    lost_sales_penalty = short * k
    reward = revenue - purchase_cost - holding_cost - lost_sales_penalty

    if params.lead_time > 0:
        new_pipeline = jnp.concatenate(
            [state.pipeline[1:], order_qty[None]])
    else:
        new_pipeline = state.pipeline  # stays empty

    step_count = state.step_count + 1
    new_state = state.replace(pipeline=new_pipeline, step_count=step_count)
    truncated = step_count >= params.step_limit

    info = _info(params, new_state)
    info.update(demand=d, revenue=revenue, purchase_cost=purchase_cost,
                holding_cost=holding_cost, lost_sales_penalty=lost_sales_penalty)
    ts = TimeStep(obs=_obs(new_state), reward=reward,
                  terminated=jnp.zeros((), bool), truncated=truncated, info=info)
    return new_state, ts


def step(params: NewsvendorParams, state: NewsvendorState,
         action: jax.Array, key: jax.Array):
    demand = sample_poisson(key, state.econ[4])
    return step_with_demand(params, state, action, demand)


ENV = Environment(
    name="newsvendor",
    default_params=default_params,
    reset=reset,
    step=step,
    step_with_demand=step_with_demand,
    observation_space=observation_space,
    action_space=action_space,
)
