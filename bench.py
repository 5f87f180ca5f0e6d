"""Headline benchmark: aggregate vectorized env-step throughput.

Runs the hardest reference environment (NetInvMgmt default 9-node graph —
reference measured at ~78 steps/s single env, pandas loops:
network_management.py:436-635) under a uniform-random policy and prints ONE
JSON line:

    {"metric": ..., "value": N, "unit": "env_steps_per_s", "vs_baseline": N}

vs_baseline is against the measured reference throughput (BASELINE.md).

Fast path: the whole-episode Pallas kernel (state VMEM-resident across all
30 periods, actions sampled in-kernel by the TPU hardware PRNG; semantics
pinned bit-exact vs the XLA step chain by tests/test_pallas_*.py, measured
head-to-head in benchmarks/pallas_episode.py). Falls back to the XLA
vmap+scan rollout when the kernel path is unavailable — and SAYS SO on
stderr with the reason (a silent fallback would let a Mosaic lowering
regression change the headline by ~1.4x invisibly). Before timing, the
kernel path is cross-checked against the XLA step chain on the same
action/demand streams at a small batch; disagreement also falls back loudly.
"""

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.vector import vecenv

REFERENCE_STEPS_PER_S = 78.0  # BASELINE.md: NetInvMgmtBacklogEnv, 2-vCPU host

NUM_ENVS_PALLAS = 4_194_304  # 4M lanes amortize the ~20-25 ms relay floor
                             # (OGT_BATCH=4194304 tools/ilp_probe.py: 2.0x
                             # over 1M lanes at E=4; 8M+ risks the relay
                             # remote-compile hang, CLAUDE.md)
EPISODES_PER_LANE = 16  # independent episodes per lane: breaks the serial
                        # contention-chain ILP ceiling (tools/ilp_probe.py:
                        # E=2 -> 1.84x, E=4 -> 3.01x at 1M lanes; at the 4M
                        # operating point E=8 measures 8.50B and E=16 9.20B
                        # — adoptable since the dump kernel's episode-RANGE
                        # slicing keeps the cross-check inside VMEM)
PALLAS_BLOCK = 1024
NUM_ENVS_XLA = 262_144
NUM_STEPS = 30
CROSSCHECK_ENVS = 4096


def _time(run, n=5):
    # NOTE: timing forces a host fetch of the result (float(...)) rather than
    # relying on block_until_ready — on the axon-relayed TPU backend
    # block_until_ready was observed to return before execution completes,
    # which silently measures dispatch rather than compute.
    float(run(jax.random.PRNGKey(0)))  # compile
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        float(run(jax.random.PRNGKey(i + 1)))
        times.append(time.perf_counter() - t0)
    return min(times)


def _poisson_lam(params):
    """Per-retail-link Poisson rates; refuses non-Poisson specs (mirrors
    fast_episodes — benchmarking zero demand for an unrecognized spec would
    silently misreport)."""
    T = params.topology
    if any(s[0] != "poisson" for s in T.rt_demand):
        raise NotImplementedError(
            f"kernel path pre-samples Poisson demand only; topology has "
            f"{[s[0] for s in T.rt_demand]}")
    return jnp.asarray([s[1] for s in T.rt_demand], jnp.float32)


def _crosscheck_kernel(params):
    """Fused kernel vs XLA step chain at the bench operating point (small
    batch). The fused kernel samples actions AND Poisson demand on-core;
    ``sample_streams_debug`` replays its exact PRNG consumption and dumps
    both streams, so the check is deterministic end-to-end: fused returns
    must match (a) the pre-materialized-stream kernel and (b) the XLA step
    chain, all fed the dumped streams. Raises on disagreement."""
    from or_gym_inventory_tpu.ops import pallas_net_step as pk
    _poisson_lam(params)  # refuse non-Poisson topologies loudly
    hi = float(params.topology.order_cap_heuristic * 2)
    seed = jnp.asarray(2024, jnp.int32)
    actions, demands = jax.jit(
        pk.sample_streams_debug, static_argnames=("act_hi", "batch", "block")
    )(params, seed, act_hi=hi, batch=CROSSCHECK_ENVS, block=1024)
    fused_ret = np.asarray(jax.jit(
        pk.episode_returns_fully_fused,
        static_argnames=("act_hi", "batch", "block"))(
            params, seed, act_hi=hi, batch=CROSSCHECK_ENVS, block=1024))

    kernel_ret = jax.jit(pk.episode_returns, static_argnames="block")(
        params, actions, demands, block=512)
    if not np.allclose(fused_ret, np.asarray(kernel_ret), rtol=1e-5,
                       atol=1e-3):
        worst = float(np.abs(fused_ret - np.asarray(kernel_ret)).max())
        raise RuntimeError(
            f"fully-fused kernel disagrees with the pre-materialized-stream "
            f"kernel on its own dumped streams (max |diff| = {worst:.4g})")

    # the interleaved-episode path (the timed configuration) must reproduce
    # per episode through the pre-materialized kernel as well. The dump
    # kernel materializes its written rows in VMEM, so the E-widened check
    # runs at 1024 envs and dumps the episodes in 8-episode RANGES (a full
    # E=16 dump would need ~24 MB of scoped vmem; the TIMED kernel has no
    # such buffer and is unaffected — all streams are still drawn in every
    # dump launch, so PRNG consumption matches the fused kernel exactly).
    E = EPISODES_PER_LANE
    ce_envs = 1024
    multi_ret = np.asarray(jax.jit(
        pk.episode_returns_fully_fused,
        static_argnames=("act_hi", "batch", "block", "episodes_per_lane"))(
            params, seed, act_hi=hi, batch=ce_envs, block=1024,
            episodes_per_lane=E))
    for e0 in range(0, E, 8):
        e1 = min(e0 + 8, E)
        acts_e, dems_e = jax.jit(
            pk.sample_streams_debug,
            static_argnames=("act_hi", "batch", "block",
                             "episodes_per_lane", "dump_range"))(
                params, seed, act_hi=hi, batch=ce_envs, block=1024,
                episodes_per_lane=E, dump_range=(e0, e1))
        for e in range(e0, e1):
            per = jax.jit(pk.episode_returns, static_argnames="block")(
                params, acts_e[:, e - e0], dems_e[:, e - e0], block=512)
            if not np.allclose(multi_ret[e], np.asarray(per), rtol=1e-5,
                               atol=1e-3):
                worst = float(np.abs(multi_ret[e] - np.asarray(per)).max())
                raise RuntimeError(
                    f"interleaved-episode kernel episode {e} disagrees with "
                    f"the pre-materialized kernel (max |diff| = {worst:.4g})")

    @jax.jit
    def xla_ret(actions, demands):
        def one_env(acts, dems):
            state, _ = net.reset(params)

            def body(state, ad):
                a, d = ad
                state, ts = net.step_with_demand(params, state, a, d)
                return state, ts.reward

            _, rew = jax.lax.scan(body, state, (acts, dems))
            return jnp.sum(rew)

        return jax.vmap(one_env, in_axes=(2, 2))(actions, demands)

    k = np.asarray(kernel_ret)
    x = np.asarray(xla_ret(actions, demands))
    if not np.allclose(k, x, rtol=1e-4, atol=1e-2):
        worst = float(np.abs(k - x).max())
        raise RuntimeError(
            f"Pallas episode kernel disagrees with the XLA step chain at the "
            f"bench operating point (max |diff| = {worst:.4g} over "
            f"{CROSSCHECK_ENVS} envs)")


def _pallas_path(params):
    """Fully-fused whole-episode kernel: state VMEM-resident, actions AND
    Poisson demand sampled on-core (kernel_roofline.py measured the XLA
    Poisson sampler at ~11x the episode kernel's own cost — fusing it is the
    difference between ~71M and several hundred M steps/s), interleaving
    EPISODES_PER_LANE independent episodes per lane (ILP; tools/ilp_probe.py)."""
    from or_gym_inventory_tpu.ops import pallas_net_step as pk
    T = params.topology
    hi = float(T.order_cap_heuristic * 2)
    _crosscheck_kernel(params)

    @jax.jit
    def run(key):
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        return pk.episode_returns_fully_fused(
            params, seed, hi, NUM_ENVS_PALLAS, block=PALLAS_BLOCK,
            episodes_per_lane=EPISODES_PER_LANE).sum()

    return _time(run), NUM_ENVS_PALLAS * EPISODES_PER_LANE


def _xla_path(params):
    space = net.ENV.action_space(params)

    def policy(_state, obs, key, _t):
        return space.sample(key, (obs.shape[0],))

    @jax.jit
    def run(key):
        _, traj = vecenv.rollout(net.ENV, params, policy, None, key,
                                 NUM_ENVS_XLA, NUM_STEPS)
        return jnp.sum(traj.reward)

    return _time(run), NUM_ENVS_XLA


def main():
    from or_gym_inventory_tpu.utils.compile_cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()
    params = net.default_params(num_periods=NUM_STEPS)
    path = "pallas"
    if jax.default_backend() != "tpu":
        print(f"bench.py: backend is {jax.default_backend()!r}, not TPU — "
              "using the XLA rollout path", file=sys.stderr)
        best, num_envs = _xla_path(params)
        path = "xla"
    else:
        try:
            best, num_envs = _pallas_path(params)
        except Exception as e:  # fall back, but never silently
            print("bench.py: Pallas kernel path FAILED — falling back to the "
                  f"XLA rollout. Reason: {type(e).__name__}: {e}",
                  file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
            best, num_envs = _xla_path(params)
            path = "xla"
    steps_per_s = num_envs * NUM_STEPS / best
    print(f"bench.py: path={path} envs={num_envs} best_iter={best:.4f}s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "net_inv_mgmt_vectorized_env_steps_per_s",
        "value": round(steps_per_s),
        "unit": "env_steps_per_s",
        "vs_baseline": round(steps_per_s / REFERENCE_STEPS_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
