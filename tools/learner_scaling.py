"""Learner throughput at TPU-native scale — the full scaling matrix.

The evaluation engine steps billions of env-steps/s (PERFORMANCE.md); this
tool measures how fast the FULL learners (rollout + GAE + minibatch SGD,
agents/ppo.py; env-step + replay + gradient steps, agents/off_policy.py)
train as the env batch grows to TPU-native sizes, across all three env
families, and attributes the time between experience generation and the
update machinery.

For each (family, num_envs, shape) it jits a scan of U updates (one device
program, the chunked-training form PPOAgent uses by default), warms the
compile, then reports best-of-3 host-fetch-timed runs as trained-steps/s =
U * num_envs * rollout_steps / wall. Shapes:

- rollout_only      the policy+env scan alone (experience generation)
- a2c / a2c_mb32    single-pass full-batch / 32-minibatch (SB3 A2C shapes)
- ppo               4 epochs x 8 shuffled minibatches (classic recipe)
- ppo_noshuffle     same, env-sliced minibatches (round-4 recipe)
- ppo_kernel        PPO off the trajectory-emitting Pallas rollout
                    (rollout='kernel'; episode-aligned, noshuffle;
                    InvManagement only — PERFORMANCE.md round 5)
- sac / td3 / ddpg  off-policy full loop, 1 gradient step per iteration
                    (a COLLECTION rate: the replay ratio falls as the
                    batch grows)
- sac_fixedrr       SAC with updates_per_iter scaled so the gradient-
                    steps : env-steps ratio stays fixed at 1:256 — the
                    number comparable across batch sizes
- sac_kernel / td3_kernel / ddpg_kernel / sac_kernel_fixedrr
                    the same loops with episode-chunked Pallas
                    collection (OffPolicyConfig(collect='kernel') —
                    round 5; same grad:env ratio per updates_per_iter)

Run on the TPU:  python tools/learner_scaling.py
Env knobs: OGT_FAMILY=inv_management|newsvendor|net_inv_management
           OGT_SIZES=4096,16384,... OGT_ROLLOUT=32 OGT_SHAPES=ppo,...
           OGT_TARGET_STEPS / OGT_MAX_U (sweep budget per point)
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from or_gym_inventory_tpu.utils.compile_cache import \
    enable_persistent_compile_cache

enable_persistent_compile_cache()

from or_gym_inventory_tpu.agents import networks
from or_gym_inventory_tpu.agents import ppo
from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.envs import newsvendor as nv
from or_gym_inventory_tpu.vector import vecenv

FAMILY = os.environ.get("OGT_FAMILY", "inv_management")
SIZES = tuple(int(x) for x in os.environ.get(
    "OGT_SIZES", "4096,16384,65536,262144").split(","))
ROLLOUT = int(os.environ.get("OGT_ROLLOUT", "32"))
SHAPES = tuple(os.environ.get(
    "OGT_SHAPES", "rollout_only,a2c,a2c_mb32,ppo").split(","))
TARGET_STEPS = int(os.environ.get("OGT_TARGET_STEPS", str(8 << 20)))
MAX_U = int(os.environ.get("OGT_MAX_U", "16"))
# off-policy actor width override (e.g. "128,128") — the network-family
# trajectory kernel crosses the relay compile-helper envelope at the
# SB3-default 256-wide actor, so its kernel/xla pair measures at 128
PI_ARCH = tuple(int(x) for x in os.environ["OGT_PI_ARCH"].split(",")) \
    if os.environ.get("OGT_PI_ARCH") else None

_FAMILIES = {
    "inv_management": (im.ENV, im.default_params),
    "newsvendor": (nv.ENV, nv.default_params),
    "net_inv_management": (net.ENV, net.default_params),
}


def time_fn(f, args, n=3):
    out = f(*args)
    float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])  # compile+sync
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def shape_cfg(shape, num_envs, horizon):
    """The algo shapes of the benchmark rosters, at sweep batch sizes."""
    base = dict(num_envs=num_envs, rollout_steps=ROLLOUT)
    if shape == "ppo":        # flagship PPO: 4 epochs x 8 minibatches
        # explicit True: measure the CLASSIC shuffled recipe even above the
        # auto-default's noshuffle threshold
        return ppo.PPOConfig(update_epochs=4, num_minibatches=8,
                             shuffle_minibatches=True, **base)
    if shape == "a2c":        # single-pass full-batch (SB3 A2C)
        return ppo.PPOConfig(update_epochs=1, num_minibatches=1,
                             anneal_lr=False, optimizer="rmsprop", **base)
    if shape == "a2c_mb32":   # single-pass, 32 minibatches (RESULTS.md row)
        return ppo.PPOConfig(update_epochs=1, num_minibatches=32,
                             anneal_lr=False, optimizer="rmsprop", **base)
    if shape == "ppo_noshuffle":  # PPO minus the per-epoch permutation
        return ppo.PPOConfig(update_epochs=4, num_minibatches=8,
                             shuffle_minibatches=False, **base)
    if shape == "ppo_kernel":  # trajectory-emitting Pallas rollout
        return ppo.PPOConfig(update_epochs=4, num_minibatches=8,
                             shuffle_minibatches=False, rollout="kernel",
                             num_envs=num_envs, rollout_steps=horizon)
    if shape == "ppo_kernel_bf16":  # + bf16 activations in the SGD phase
        return ppo.PPOConfig(update_epochs=4, num_minibatches=8,
                             shuffle_minibatches=False, rollout="kernel",
                             compute_dtype="bfloat16",
                             num_envs=num_envs, rollout_steps=horizon)
    if shape == "a2c_kernel":  # single-pass A2C off the kernel rollout
        return ppo.PPOConfig(update_epochs=1, num_minibatches=1,
                             anneal_lr=False, optimizer="rmsprop",
                             rollout="kernel", num_envs=num_envs,
                             rollout_steps=horizon)
    raise ValueError(shape)


def measure_learner(env, params, shape, num_envs):
    horizon = env.horizon(params)
    cfg = shape_cfg(shape, num_envs, horizon)
    U = min(MAX_U, max(2, TARGET_STEPS // (num_envs * cfg.rollout_steps)))
    update = ppo.make_update_fn(env, params, cfg, total_updates=U)
    state = jax.jit(lambda k: ppo.init_train_state(
        env, params, cfg, k, U))(jax.random.PRNGKey(0))
    chunk = jax.jit(lambda st, ks: jax.lax.scan(update, st, ks))
    keys = jax.random.split(jax.random.PRNGKey(1), U)
    t0 = time.perf_counter()
    best = time_fn(lambda st, ks: chunk(st, ks)[1]["pg_loss"], (state, keys))
    compile_s = time.perf_counter() - t0 - 3 * best
    steps = U * num_envs * cfg.rollout_steps
    return dict(updates_per_call=U, time_ms=round(best * 1e3, 2),
                compile_s=round(compile_s, 1),
                trained_steps_per_s=round(steps / best),
                us_per_update=round(best / U * 1e6))


def measure_offpolicy(env, params, num_envs, algo="sac", fixed_rr=False,
                      collect="xla"):
    """SAC/TD3/DDPG through the full off-policy update (one env step per
    env + gradient step(s) per iteration, sharded replay). With
    ``fixed_rr`` the gradient-steps : env-steps ratio is held at 1:256
    (updates_per_iter scales with num_envs) so the number stays comparable
    across batch sizes. ``collect="kernel"`` measures the episode-chunked
    Pallas collection path (one iteration = num_envs * horizon env steps
    + horizon * updates_per_iter gradient steps — the SAME grad:env ratio
    per updates_per_iter as the XLA rows)."""
    from or_gym_inventory_tpu.agents import off_policy as op
    horizon = env.horizon(params)
    upi = max(1, num_envs // 256) if fixed_rr else 1
    steps_per_iter = num_envs * (horizon if collect == "kernel" else 1)
    extra = dict(pi_arch=PI_ARCH) if PI_ARCH else {}
    cfg = op.OffPolicyConfig(algo=algo, num_envs=num_envs,
                             buffer_size=max(1 << 18, num_envs * 4,
                                             steps_per_iter),
                             batch_size=256, start_steps=0,
                             updates_per_iter=upi, collect=collect,
                             **extra)
    init, update, _ = op.make_offpolicy(env, params, cfg)
    state = jax.jit(init)(jax.random.PRNGKey(0))
    U = max(2, min(MAX_U, TARGET_STEPS // (steps_per_iter * 8)))

    def chunk(st, ks):
        def body(carry, k):
            st, m = update(carry, k)
            return st, m["mean_step_reward"]

        return jax.lax.scan(body, st, ks)[1]

    keys = jax.random.split(jax.random.PRNGKey(1), U)
    t0 = time.perf_counter()
    best = time_fn(jax.jit(chunk), (state, keys))
    compile_s = time.perf_counter() - t0 - 3 * best
    steps = U * steps_per_iter
    return dict(updates_per_call=U, time_ms=round(best * 1e3, 2),
                compile_s=round(compile_s, 1),
                updates_per_iter=upi,
                trained_steps_per_s=round(steps / best),
                us_per_update=round(best / U * 1e6))


def measure_recurrent(env, params, num_envs, kernel=False):
    """Recurrent PPO (the benchmark PPO_LSTM arch: 64-enc / 128-hidden)
    through the full update — XLA carry-threading rollout, or the LSTM
    trajectory-emitting kernel (rollout='kernel', episode-aligned)."""
    from or_gym_inventory_tpu.agents import recurrent_ppo as rp
    horizon = env.horizon(params)
    steps = horizon if kernel else ROLLOUT
    cfg = rp.RecurrentPPOConfig(num_envs=num_envs, rollout_steps=steps,
                                num_minibatches=8, update_epochs=4,
                                rollout=("kernel" if kernel else "xla"))
    U = min(MAX_U, max(2, TARGET_STEPS // (num_envs * steps)))
    init, update, _ = rp.make_train_fns(env, params, cfg, U)
    state = jax.jit(init)(jax.random.PRNGKey(0))
    chunk = jax.jit(lambda st, ks: jax.lax.scan(update, st, ks))
    keys = jax.random.split(jax.random.PRNGKey(1), U)
    t0 = time.perf_counter()
    best = time_fn(lambda st, ks: chunk(st, ks)[1]["pg_loss"], (state, keys))
    compile_s = time.perf_counter() - t0 - 3 * best
    n_steps = U * num_envs * steps
    return dict(updates_per_call=U, time_ms=round(best * 1e3, 2),
                compile_s=round(compile_s, 1),
                trained_steps_per_s=round(n_steps / best),
                us_per_update=round(best / U * 1e6))


def measure_rollout_only(env, params, num_envs):
    """Experience generation alone: the same fused policy+env scan the
    update starts with (policy inference + env step + auto-reset), no SGD."""
    cfg = shape_cfg("a2c", num_envs, env.horizon(params))
    model = ppo._make_model(env, params, cfg)
    space = env.action_space(params)
    low = jnp.asarray(space.low, jnp.float32)
    high = jnp.asarray(np.where(np.isinf(space.high), 1e4, space.high),
                       jnp.float32)
    int_actions = np.issubdtype(space.dtype, np.integer)
    p0 = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, env.observation_space(params).shape[0]),
                              jnp.float32))

    def policy(_ps, obs, key, _t):
        mean, log_std, _ = model.apply(p0, obs.astype(jnp.float32))
        raw = networks.gaussian_sample(key, mean, log_std)
        a = networks.squash_action(raw, low, high)
        return a.astype(jnp.int32) if int_actions else a

    U = min(MAX_U, max(2, TARGET_STEPS // (num_envs * ROLLOUT)))

    def run(key):
        # mirror the learner: reset once, then scan U rollouts of ROLLOUT
        # steps each, carrying (env_state, obs) across update boundaries
        rkey, key = jax.random.split(key)
        state, ts0 = vecenv.batch_reset(env, params, rkey, num_envs)

        def body(carry, k):
            (state, obs, _), traj = vecenv.rollout(
                env, params, policy, None, k, num_envs, ROLLOUT,
                init_carry=carry)
            return (state, obs), jnp.sum(traj.reward)

        _, tot = jax.lax.scan(body, (state, ts0.obs),
                              jax.random.split(key, U))
        return jnp.sum(tot)

    best = time_fn(jax.jit(run), (jax.random.PRNGKey(2),))
    steps = U * num_envs * ROLLOUT
    return dict(updates_per_call=U, time_ms=round(best * 1e3, 2),
                trained_steps_per_s=round(steps / best),
                us_per_update=round(best / U * 1e6))


def main():
    env, params_factory = _FAMILIES[FAMILY]
    params = params_factory()
    print(json.dumps({"family": FAMILY, "rollout_steps": ROLLOUT,
                      "horizon": env.horizon(params),
                      "backend": jax.default_backend()}), flush=True)
    for num_envs in SIZES:
        for shape in SHAPES:
            try:
                if shape == "rollout_only":
                    row = measure_rollout_only(env, params, num_envs)
                elif shape in ("sac", "td3", "ddpg"):
                    row = measure_offpolicy(env, params, num_envs, shape)
                elif shape == "sac_fixedrr":
                    row = measure_offpolicy(env, params, num_envs, "sac",
                                            fixed_rr=True)
                elif shape in ("sac_kernel", "td3_kernel", "ddpg_kernel"):
                    row = measure_offpolicy(env, params, num_envs,
                                            shape[:-7], collect="kernel")
                elif shape == "sac_kernel_fixedrr":
                    row = measure_offpolicy(env, params, num_envs, "sac",
                                            fixed_rr=True, collect="kernel")
                elif shape == "rppo":
                    row = measure_recurrent(env, params, num_envs)
                elif shape == "rppo_kernel":
                    row = measure_recurrent(env, params, num_envs,
                                            kernel=True)
                else:
                    row = measure_learner(env, params, shape, num_envs)
            except Exception as e:
                print(json.dumps({"shape": shape, "num_envs": num_envs,
                                  "error": f"{type(e).__name__}: "
                                           f"{str(e)[:200]}"}), flush=True)
                continue
            print(json.dumps({"shape": shape, "num_envs": num_envs, **row}),
                  flush=True)


if __name__ == "__main__":
    main()
