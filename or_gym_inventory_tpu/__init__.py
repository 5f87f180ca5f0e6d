"""or-gym-inventory-tpu: TPU-native vectorized inventory-environment engine.

A ground-up JAX/XLA re-design of the capabilities of the reference repo
``jacklu2016/or-gym-inventory`` (three Gymnasium inventory-env families plus a
heuristic/RL benchmarking harness), built TPU-first:

- Environments are pure functions over pytrees (``step(params, state, action,
  key) -> (state, timestep)``), compiled once with ``jax.jit`` and batched with
  ``jax.vmap`` (thousands of env instances per chip).
- Episode time runs under ``lax.scan`` with static horizons (every reference
  env truncates at a static step limit: newsvendor.py:190,
  inventory_management.py:350, network_management.py:624).
- Multi-chip scaling shards the env batch over a ``jax.sharding.Mesh`` with
  ``shard_map``; metrics reduce with ``psum`` over ICI. Env shards never
  communicate (embarrassingly parallel lockstep batch).
- A host-side Gymnasium-compatible adapter layer reproduces the reference's
  NumPy-PCG64 randomness draw-for-draw for exact trajectory parity, while the
  JAX counter-based RNG is the performance path.

Package layout:
    core/      spaces, pytree structs, config override, numpy-parity RNG
    ops/       device samplers (poisson/binomial/randint/geometric), poisson ppf
    envs/      newsvendor, inv_management, net_inv_management (+ topology
               compiler) as pure functions; gymnasium adapters
    vector/    vmap batching, auto-reset, lax.scan rollouts
    parallel/  device-mesh sharding, multi-host bring-up
    agents/    heuristic policies, on-device PPO/A2C/SAC... actor-learners
    bench/     seeded evaluation harness, reporting, plots
    utils/     checkpointing, profiling
"""

__version__ = "0.1.0"

from or_gym_inventory_tpu.core import spaces  # noqa: F401
