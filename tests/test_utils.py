"""Checkpoint/resume + profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.utils import checkpoint as ckpt
from or_gym_inventory_tpu.utils import profiling


def test_env_state_checkpoint_resume_exact(tmp_path):
    """Save mid-episode, restore, and the continuation is identical —
    counter-based RNG makes resume exact."""
    params = im.default_params(periods=20)
    key = jax.random.PRNGKey(5)
    state, _ = im.reset(params)
    action = jnp.asarray([30, 30, 30], jnp.int32)
    for t in range(7):
        state, _ = im.step(params, state, action, jax.random.fold_in(key, t))

    path = ckpt.save_pytree(str(tmp_path / "env_state.msgpack"), state)
    restored = ckpt.load_pytree(path, state)

    step = jax.jit(im.step, static_argnums=0)
    s1, s2 = state, restored
    for t in range(7, 12):
        k = jax.random.fold_in(key, t)
        s1, ts1 = step(params, s1, action, k)
        s2, ts2 = step(params, s2, action, k)
        np.testing.assert_array_equal(np.asarray(ts1.obs), np.asarray(ts2.obs))
        assert float(ts1.reward) == float(ts2.reward)


def test_orbax_checkpointer_roundtrip(tmp_path):
    params = im.default_params(periods=5)
    state, _ = im.reset(params)
    mgr = ckpt.OrbaxCheckpointer(str(tmp_path / "orbax"))
    mgr.save(0, {"inv": state.inv, "period": state.period})
    mgr.wait()
    restored = mgr.restore(template={"inv": state.inv, "period": state.period})
    np.testing.assert_array_equal(np.asarray(restored["inv"]),
                                  np.asarray(state.inv))


def test_measure_steps_per_second():
    f = jax.jit(lambda x: (x * 2).sum())
    stats = profiling.measure_steps_per_second(
        f, jnp.ones(128), steps_per_call=128, iters=2)
    assert stats["steps_per_s"] > 0 and stats["best_exec_s"] > 0
