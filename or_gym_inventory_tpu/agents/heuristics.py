"""Heuristic policies — the reference's full roster, in two forms.

Host agents (BaseAgent protocol, NumPy/SciPy) mirror the benchmark scripts'
classes formula-for-formula:
- OrderUpToHeuristicAgent        benchmark_newsvendor.py:97-111
- ClassicNewsvendorAgent         benchmark_newsvendor.py:113-161
- sSPolicyAgent                  benchmark_newsvendor_sb3_rllib.py:343-351
- BaseStockAgent                 benchmark_InvManagementBacklogEnv.py:142-198
- ConstantOrderAgent             benchmark_NetInvMgmtBacklogEnv.py:119-134

Device policies (``make_*``) are the vmappable JAX counterparts for batched
on-device evaluation; `scipy.stats.poisson.ppf` becomes the fixed-iteration
``ops.distributions.poisson_ppf``. Cross-checked in tests/test_heuristics.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy.stats import poisson

from or_gym_inventory_tpu.agents.base import BaseAgent
from or_gym_inventory_tpu.ops.distributions import poisson_ppf


# ============================================================ newsvendor (host)

class OrderUpToHeuristicAgent(BaseAgent):
    """Order up to mu*(L+1)*SF minus pipeline position."""

    def __init__(self, safety_factor: float = 1.0):
        super().__init__(name=f"OrderUpTo_SF={safety_factor:.1f}")
        self.safety_factor = safety_factor

    def get_action(self, observation, env):
        mu = observation[4]
        pipeline = observation[5:]
        target = mu * (env.lead_time + 1) * self.safety_factor
        order = max(0, target - pipeline.sum())
        order = np.clip(order, env.action_space.low[0], env.action_space.high[0])
        return np.array([order], dtype=env.action_space.dtype)

    def device_policy(self, env, params):
        sf, L = self.safety_factor, params.lead_time
        space = env.action_space(params)

        def policy(_state, obs, key, _t):
            mu = obs[:, 4]
            pos = jnp.sum(obs[:, 5:], axis=1)
            order = jnp.maximum(0.0, mu * (L + 1) * sf - pos)
            return space.clip(order[:, None])
        return policy


class ClassicNewsvendorAgent(BaseAgent):
    """Critical-ratio Poisson quantile order-up-to, with the reference's
    fallback on degenerate costs."""

    def __init__(self, cr_method: str = "k_vs_h", safety_factor: float = 1.0):
        super().__init__(name=f"ClassicNV_SF={safety_factor:.1f}_{cr_method}")
        self.cr_method = cr_method
        self.safety_factor = safety_factor

    def _critical_ratio(self, price, cost, h, k):
        if self.cr_method == "profit_margin":
            underage, overage = price - cost + k, h
            if underage + overage <= 1e-6 or underage <= 0 or overage <= 0:
                return None
            return underage / (underage + overage)
        if h + k <= 1e-6 or k < 0 or h < 0:
            return None
        return k / (h + k)

    def get_action(self, observation, env):
        price, cost, h, k, mu = observation[:5]
        pipeline = observation[5:]
        cr = self._critical_ratio(price, cost, h, k)
        if cr is None:
            target = mu * (env.lead_time + 1)
        else:
            eff_mu = mu * (env.lead_time + 1) * self.safety_factor
            target = poisson.ppf(cr, mu=max(1e-6, eff_mu))
        order = max(0, target - pipeline.sum())
        order = np.clip(order, env.action_space.low[0], env.action_space.high[0])
        return np.array([order], dtype=env.action_space.dtype)

    def device_policy(self, env, params):
        sf, L = self.safety_factor, params.lead_time
        profit_margin = self.cr_method == "profit_margin"
        space = env.action_space(params)

        def policy(_state, obs, key, _t):
            price, cost, h, k, mu = (obs[:, i] for i in range(5))
            if profit_margin:
                under, over = price - cost + k, h
                bad = (under + over <= 1e-6) | (under <= 0) | (over <= 0)
                cr = jnp.where(bad, 0.5, under / jnp.maximum(under + over, 1e-6))
            else:
                bad = (h + k <= 1e-6) | (k < 0) | (h < 0)
                cr = jnp.where(bad, 0.5, k / jnp.maximum(h + k, 1e-6))
            eff_mu = mu * (L + 1) * sf
            target_q = poisson_ppf(cr, jnp.maximum(1e-6, eff_mu))
            target = jnp.where(bad, mu * (L + 1), target_q)
            pos = jnp.sum(obs[:, 5:], axis=1)
            order = jnp.maximum(0.0, target - pos)
            return space.clip(order[:, None])
        return policy


class sSPolicyAgent(BaseAgent):
    """(s, S): order S - position iff position < s. Matches the reference
    implementation, where ``s`` uses the k/(h+k) quantile (the ``s_quantile``
    constructor arg is vestigial there and kept only for name parity,
    benchmark_newsvendor_sb3_rllib.py:343-351)."""

    def __init__(self, s_quantile: float = 0.5, S_buffer_factor: float = 1.2):
        super().__init__(
            name=f"sS_Policy(s={s_quantile:.2f},S={S_buffer_factor:.1f}s)")
        self.s_quantile = s_quantile
        self.S_buffer_factor = S_buffer_factor

    def get_action(self, observation, env):
        price, cost, h, k, mu = observation[:5]
        pipeline = observation[5:]
        lead_time = env.lead_time
        s_lvl = 0.0
        if h + k > 1e-6:
            cr = np.clip(k / (h + k), 0.001, 0.999)
            s_lvl = max(0.0, poisson.ppf(cr, mu=max(1e-6, mu * (lead_time + 1))))
        S_lvl = s_lvl * self.S_buffer_factor
        pos = pipeline.sum()
        order = max(0, S_lvl - pos) if pos < s_lvl else 0
        order = np.clip(order, env.action_space.low[0], env.action_space.high[0])
        return np.array([order], dtype=env.action_space.dtype)

    def device_policy(self, env, params):
        L, buf = params.lead_time, self.S_buffer_factor
        space = env.action_space(params)

        def policy(_state, obs, key, _t):
            h, k, mu = obs[:, 2], obs[:, 3], obs[:, 4]
            ok = h + k > 1e-6
            cr = jnp.clip(k / jnp.maximum(h + k, 1e-6), 0.001, 0.999)
            s_lvl = jnp.where(
                ok, jnp.maximum(0.0, poisson_ppf(cr, jnp.maximum(1e-6, mu * (L + 1)))),
                0.0)
            S_lvl = s_lvl * buf
            pos = jnp.sum(obs[:, 5:], axis=1)
            order = jnp.where(pos < s_lvl, jnp.maximum(0.0, S_lvl - pos), 0.0)
            return space.clip(order[:, None])
        return policy


# ======================================================= inv management (host)

class BaseStockAgent(BaseAgent):
    """Per-stage base-stock: position (on-hand + pipeline from the action
    log) vs target (L_i+1)*mu*SF. Explicitly the reference's simplification —
    final-customer mu for all stages (benchmark_InvManagementBacklogEnv.py:
    142-198)."""

    def __init__(self, safety_factor: float = 1.0):
        super().__init__(name=f"BaseStock_SF={safety_factor:.1f}")
        self.safety_factor = safety_factor

    def get_action(self, observation, env):
        needed = ["num_stages", "lead_time", "dist_param", "lt_max", "I",
                  "action_log", "period"]
        if not all(hasattr(env, a) for a in needed):
            print(f"Warning: Env missing attributes needed for {self.name}. "
                  "Returning random action.")
            return env.action_space.sample().astype(env.action_space.dtype)
        m1 = env.num_stages - 1
        lead_times = env.lead_time
        mu = env.dist_param.get("mu", 10)
        position = observation[:m1].astype(np.float64).copy()
        t = env.period
        for i in range(m1):
            li = int(lead_times[i])
            if li == 0:
                continue
            lo = max(0, t - li)
            if t > 0 and lo < t:
                position[i] += env.action_log[lo:t, i].sum()
        targets = (lead_times + 1) * mu * self.safety_factor
        orders = np.maximum(0, targets - position)
        orders = np.clip(orders, env.action_space.low, env.action_space.high)
        return orders.astype(env.action_space.dtype)

    def device_policy(self, env, params):
        sf = self.safety_factor
        m1, lt = params.m1, params.lt_max
        L = np.asarray(params.L)
        mu = params.dist_param_dict.get("mu", 10)
        space = env.action_space(params)
        targets = jnp.asarray((L + 1) * mu * sf, jnp.float32)

        def policy(_state, obs, key, t):
            on_hand = obs[:, :m1].astype(jnp.float32)
            hist = obs[:, m1:].reshape(obs.shape[0], lt, m1).astype(jnp.float32)
            # chronological rows 0..min(t,lt)-1 hold the last orders; the
            # last L_i of them are in flight (same window the host agent
            # takes from env.action_log)
            n_valid = jnp.minimum(t, lt)
            rows = jnp.arange(lt)
            mask = (rows[None, :] >= (n_valid - L[:, None])) & (rows[None, :] < n_valid)
            # mask: (m1, lt) -> pipeline per stage
            pipe = jnp.einsum("brm,mr->bm", hist, mask.astype(jnp.float32))
            orders = jnp.maximum(0.0, targets[None] - (on_hand + pipe))
            return space.clip(orders).astype(jnp.int32)
        return policy


# ========================================================== network env (host)

class ConstantOrderAgent(BaseAgent):
    """Constant fraction of the action-space high per link
    (benchmark_NetInvMgmtBacklogEnv.py:119-134, incl. the inf->1000 clamp)."""

    def __init__(self, order_fraction: float = 0.1):
        super().__init__(name=f"ConstantOrder_{order_fraction * 100:.0f}%")
        self.order_fraction = order_fraction
        self._action = None

    def get_action(self, observation, env):
        if self._action is None:
            high = env.action_space.high.copy()
            high[high == np.inf] = 1000
            self._action = (high * self.order_fraction).astype(env.action_space.dtype)
        return self._action

    def device_policy(self, env, params):
        space = env.action_space(params)
        high = np.where(np.isinf(space.high), 1000, space.high)
        action = jnp.asarray(high * self.order_fraction, jnp.float32)

        def policy(_state, obs, key, _t):
            return jnp.broadcast_to(action, (obs.shape[0],) + action.shape)
        return policy
