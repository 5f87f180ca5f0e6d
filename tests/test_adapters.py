"""Drop-in adapter fidelity: bitwise trajectory parity vs the live reference
(same seed -> same PCG64 draws -> identical obs/reward streams), plus
cross-validation against the JAX functional core."""

import numpy as np
import pytest

from or_gym_inventory_tpu.envs import adapters as ad


def _run(env, actions, seed):
    obs, info = env.reset(seed=seed)
    out_obs, out_rew, out_info = [obs], [], []
    for a in actions:
        obs, r, te, tr, info = env.step(a)
        out_obs.append(obs)
        out_rew.append(r)
        out_info.append(info)
        if te or tr:
            break
    return out_obs, out_rew, out_info


@pytest.mark.parametrize("seed", [42, 7])
def test_newsvendor_adapter_bitwise(reference_modules, seed):
    ref_env = reference_modules["newsvendor"].NewsvendorEnv()
    our_env = ad.NewsvendorEnv()
    actions = [np.array([x], np.float32) for x in
               [0, 50, 100, 1500, 2500, 100, 0, 300] * 5]
    ro, rr, ri = _run(ref_env, actions, seed)
    oo, orew, oi = _run(our_env, actions, seed)
    assert len(rr) == len(orew)
    np.testing.assert_array_equal(np.array(ro), np.array(oo))
    np.testing.assert_allclose(rr, orew, rtol=1e-12)
    for a, b in zip(ri, oi):
        assert a["demand"] == b["demand"]


@pytest.mark.parametrize("seed,backlog", [(42, True), (5, False)])
def test_inv_management_adapter_bitwise(reference_modules, seed, backlog):
    refmod = reference_modules["inv"]
    cls_ref = (refmod.InvManagementBacklogEnv if backlog
               else refmod.InvManagementLostSalesEnv)
    cls_our = (ad.InvManagementBacklogEnv if backlog
               else ad.InvManagementLostSalesEnv)
    cfg = {"periods": 25}
    ref_env, our_env = cls_ref(env_config=cfg), cls_our(env_config=cfg)
    rng = np.random.default_rng(0)
    actions = [rng.integers(0, 120, size=3).astype(np.int64) for _ in range(25)]
    ro, rr, ri = _run(ref_env, actions, seed)
    oo, orew, oi = _run(our_env, actions, seed)
    np.testing.assert_array_equal(np.array(ro), np.array(oo))
    np.testing.assert_allclose(rr, orew, rtol=1e-9)
    for a, b in zip(ri, oi):
        np.testing.assert_array_equal(a["sales"], b["sales"])
        np.testing.assert_array_equal(a["unfulfilled"], b["unfulfilled"])
        np.testing.assert_array_equal(a["ending_inventory"], b["ending_inventory"])


@pytest.mark.parametrize("cls_name", ["NetInvMgmtBacklogEnv", "NetInvMgmtLostSalesEnv"])
def test_net_inv_adapter_bitwise(reference_modules, cls_name):
    refmod = reference_modules["net"]
    ref_env = getattr(refmod, cls_name)(num_periods=25)
    our_env = getattr(ad, cls_name)(num_periods=25)
    assert our_env.backlog == ref_env.backlog  # incl. the override quirk
    rng = np.random.default_rng(1)
    actions = [rng.uniform(0, 60, size=11).astype(np.float32) for _ in range(25)]
    ro, rr, ri = _run(ref_env, actions, 42)
    oo, orew, oi = _run(our_env, actions, 42)
    np.testing.assert_allclose(np.array(ro), np.array(oo), atol=1e-4)
    np.testing.assert_allclose(rr, orew, rtol=1e-9, atol=1e-9)
    # state frames the evaluator reads match
    np.testing.assert_allclose(ref_env.X.to_numpy(), our_env.X.to_numpy(),
                               atol=1e-9)
    np.testing.assert_allclose(ref_env.U.to_numpy(), our_env.U.to_numpy(),
                               atol=1e-9)
    np.testing.assert_allclose(
        ref_env.S[ref_env.retail_links].to_numpy(),
        our_env.S[our_env.retail_links].to_numpy(), atol=1e-9)


def test_net_inv_custom_adapter_bitwise(reference_modules):
    refmod = reference_modules["net_custom"]
    ref_env = refmod.NetInvMgmtLostSalesEnv(num_periods=30)
    our_env = ad.NetInvMgmtCustomLostSalesEnv(num_periods=30)
    actions = [np.full(5, 20.0, np.float32)] * 30
    ro, rr, _ = _run(ref_env, actions, 42)
    oo, orew, _ = _run(our_env, actions, 42)
    np.testing.assert_allclose(np.array(ro), np.array(oo), atol=1e-4)
    np.testing.assert_allclose(rr, orew, rtol=1e-9, atol=1e-9)


def test_customizable_newsvendor_fixed_params():
    env = ad.CustomizableNewsvendorEnv()
    fixed = {"price": 50.0, "cost": 25.0, "h": 2.0, "k": 5.0, "mu": 30.0}
    obs, info = env.reset(seed=0, options={"fixed_params": fixed})
    np.testing.assert_allclose(obs[:5], [50.0, 25.0, 2.0, 5.0, 30.0])
    assert info["fixed_params_used"] == fixed
    # randomized again without options
    obs2, _ = env.reset(seed=0)
    assert abs(obs2[4] - 30.0) > 1e-6 or abs(obs2[0] - 50.0) > 1e-6


def test_adapter_matches_jax_core_inv():
    """The adapter's NumPy dynamics and the JAX core agree given the same
    injected demand stream."""
    import jax.numpy as jnp
    from or_gym_inventory_tpu.core import parity
    from or_gym_inventory_tpu.envs import inv_management as im

    env = ad.InvManagementBacklogEnv(env_config={"periods": 15})
    obs, _ = env.reset(seed=33)
    params = im.default_params(env_config={"periods": 15}, backlog=True)
    rng = parity.reference_rng(33)
    demands = parity.inv_management_demand_stream(
        rng, params.dist, params.dist_param_dict, 15)
    state, ts = im.reset(params)
    action = np.array([30, 40, 50], np.int64)
    for t in range(15):
        obs_a, r_a, _, _, _ = env.step(action)
        state, ts = im.step_with_demand(
            params, state, jnp.asarray(action, jnp.int32), jnp.asarray(demands[t]))
        np.testing.assert_array_equal(obs_a, np.asarray(ts.obs))
        assert abs(r_a - float(ts.reward)) < 1e-2


def test_adapter_matches_jax_core_net():
    import jax.numpy as jnp
    from or_gym_inventory_tpu.core import parity
    from or_gym_inventory_tpu.envs import net_inv_management as net

    env = ad.NetInvMgmtBacklogEnv(num_periods=12)
    obs, _ = env.reset(seed=21)
    params = net.default_params(num_periods=12, backlog=True)
    rng = parity.reference_rng(21)
    demands = parity.net_inv_demand_stream(
        rng, params.topology.retail_dist_params(), 12)
    state, ts = net.reset(params)
    action = np.full(11, 25.0, np.float32)
    for t in range(12):
        obs_a, r_a, _, _, _ = env.step(action)
        state, ts = net.step_with_demand(
            params, state, jnp.asarray(action), jnp.asarray(demands[t]))
        np.testing.assert_allclose(obs_a, np.asarray(ts.obs), atol=1e-2)
        assert abs(r_a - float(ts.reward)) < 1e-2
