"""Whole-episode Pallas kernels (Newsvendor / InvManagement): exactness vs
the XLA step_with_demand chain, in interpret mode on the CPU mesh.

The in-kernel-RNG variants need the TPU hardware PRNG (no interpret-mode
lowering for pltpu.prng_seed here) — they are validated distributionally on
hardware (benchmarks/pallas_episode.py) and share all step math with the
exact variants tested below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.envs import newsvendor as nv
from or_gym_inventory_tpu.ops import pallas_episode_kernels as pek


def _nv_reference_returns(params, econ, actions, demands):
    """Chain the XLA step_with_demand over the horizon for each lane."""
    B = econ.shape[1]

    def one(econ_lane, acts, dems):
        state, _ = nv.reset_with_econ(params, econ_lane)

        def body(state, inputs):
            a, d = inputs
            state, ts = nv.step_with_demand(params, state, a[None], d)
            return state, ts.reward

        _, rews = jax.lax.scan(body, state, (acts, dems))
        gam = params.gamma ** jnp.arange(params.step_limit, dtype=jnp.float32)
        return jnp.sum(gam * rews)

    return jax.vmap(one, in_axes=(1, 1, 1))(econ, actions, demands)


def test_nv_episode_kernel_exact():
    params = nv.default_params(step_limit=13, lead_time=5)
    B = 256
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    econ = jax.vmap(lambda k: nv.draw_econ(params, k), out_axes=1)(
        jax.random.split(k1, B))
    actions = jax.random.uniform(k2, (params.step_limit, B), minval=-50.0,
                                 maxval=params.max_order_quantity * 1.1)
    demands = jax.random.poisson(k3, econ[4], (params.step_limit, B)
                                 ).astype(jnp.float32)
    got = pek.episode_returns_nv(params, econ, actions, demands,
                                 block=128, interpret=True)
    want = _nv_reference_returns(params, econ, actions, demands)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-2)


def test_nv_episode_kernel_exact_zero_lead_time():
    params = nv.default_params(step_limit=7, lead_time=0)
    B = 128
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    econ = jax.vmap(lambda k: nv.draw_econ(params, k), out_axes=1)(
        jax.random.split(k1, B))
    actions = jax.random.uniform(k2, (params.step_limit, B), minval=0.0,
                                 maxval=params.max_order_quantity)
    demands = jax.random.poisson(k3, econ[4], (params.step_limit, B)
                                 ).astype(jnp.float32)
    got = pek.episode_returns_nv(params, econ, actions, demands,
                                 block=128, interpret=True)
    want = _nv_reference_returns(params, econ, actions, demands)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-2)


def _im_reference_returns(params, actions, demands):
    def one(acts, dems):
        state, _ = im.reset(params)

        def body(state, inputs):
            a, d = inputs
            state, ts = im.step_with_demand(params, state, a, d)
            return state, ts.reward

        _, rews = jax.lax.scan(body, state, (acts, dems))
        return jnp.sum(rews)  # step reward already alpha^t-discounted

    return jax.vmap(one, in_axes=(2, 1))(actions, demands)


@pytest.mark.parametrize("backlog", [True, False])
def test_im_episode_kernel_exact(backlog):
    params = im.default_params(periods=17, backlog=backlog)
    B = 256
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    c = jnp.asarray(params.c, jnp.int32)
    actions = jax.random.randint(k1, (params.periods, params.m1, B),
                                 0, c[None, :, None] + 1, dtype=jnp.int32)
    demands = jax.random.poisson(k2, 20.0, (params.periods, B)
                                 ).astype(jnp.int32)
    got = pek.episode_returns_im(params, actions, demands,
                                 block=128, interpret=True)
    want = _im_reference_returns(params, actions, demands)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-2)


def test_im_episode_kernel_zero_lead_time_stage():
    """L containing 0 exercises the same-period-arrival branch."""
    params = im.default_params(periods=9, L=(0, 2, 3), dist_param={"mu": 10})
    B = 128
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    c = jnp.asarray(params.c, jnp.int32)
    actions = jax.random.randint(k1, (params.periods, params.m1, B),
                                 0, c[None, :, None] + 1, dtype=jnp.int32)
    demands = jax.random.poisson(k2, 10.0, (params.periods, B)
                                 ).astype(jnp.int32)
    got = pek.episode_returns_im(params, actions, demands,
                                 block=128, interpret=True)
    want = _im_reference_returns(params, actions, demands)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-2)
